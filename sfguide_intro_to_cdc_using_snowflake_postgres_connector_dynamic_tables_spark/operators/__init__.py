"""Engine extension operators.

- ``semi_join`` -- the Snowpark ``isin(DataFrame)`` shim (SURVEY P7).
- ``dedup``     -- exact + fuzzy dedup family (MinHash-LSH, SimHash,
                   n-gram Jaccard, embedding cosine).
- ``similarity``-- ANN / top-k cosine search over embedding columns.
- ``text``      -- language-ID, quality scoring, token counting,
                   fingerprinting over document text.
- ``multimodal``-- binary-column (image/audio/video) plumbing +
                   perceptual hashing (aHash/pHash/audio FFT
                   fingerprint/video hash sequences) with
                   banded-hamming near-dup pairing.
- ``quality_model`` -- trained quality classifier: pyspark.ml
                   training, zero-shuffle codegen scoring.
- ``training``  -- mixture/budget/pack/shuffle + verified shard
                   export (full and incremental).
"""

from .semi_join import anti_join, isin_dataframe

__all__ = ["anti_join", "isin_dataframe"]
