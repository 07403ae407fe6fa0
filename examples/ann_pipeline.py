"""Embedding curation + approximate search on the engine.

The vector side of a training-data / RAG stack, end to end:

    embeddings -> SemDeDup semantic dedup        (keep one per near-dup set)
               -> semantic decontamination       (drop benchmark-adjacent rows)
               -> IVF-PQ approximate top-k       (coarse cells + PQ codes)
               -> exact cosine rerank of the survivors

Every quantizer (IVF cells, PQ codebooks) trains on a bounded
driver-side sample, so the whole path is deterministic and the driver
state stays constant-size at any corpus scale.  The search stage never
touches raw vectors until the final rerank: cells prune to
~n_probe/n_cells of the rows, PQ scores the rest from m small codes
per row (16x less scan I/O than the raw vectors at d=16/m=4).

Run: python examples/ann_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators import (
    dedup,
    similarity,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import (
    get_spark,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.testdata import (
    load_table,
)

DEDUP_THRESHOLD = 0.4  # the synthetic embeddings' cosine range tops out ~0.51
DECON_THRESHOLD = 0.35
FINAL_K = 5
PQ_CANDIDATES = 25  # PQ survivors handed to the exact rerank


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="ann-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    emb = load_table(spark, sf_dir, "embeddings")
    total = emb.count()

    # Stage 1: SemDeDup -- cluster with the coarse quantizer, keep one
    # representative per in-cell near-dup set.  One shuffle.
    verdicts = dedup.semantic_dedup(emb, threshold=DEDUP_THRESHOLD).cache()
    kept_ids = verdicts.filter(F.col("kept")).select("vec_id")
    print(f"semantic dedup: {total} -> {kept_ids.count()} vectors")

    # Stage 2: benchmark decontamination -- vec_id % 10 == 0 plays the
    # held-out benchmark; training vectors semantically close to any
    # benchmark vector are dropped.
    train = emb.join(kept_ids, "vec_id").filter(F.col("vec_id") % 10 != 0)
    bench = emb.filter(F.col("vec_id") % 10 == 0)
    flags = dedup.semantic_decontaminate(
        train, bench, threshold=DECON_THRESHOLD
    )
    clean = train.join(
        flags.filter(~F.col("contaminated")).select("vec_id"), "vec_id"
    ).cache()
    print(f"decontamination: {train.count()} -> {clean.count()} train vectors")

    # Stage 3: IVF-PQ search over the curated set.  Quantizers train on
    # the curated table's own bounded sample; scoring reads codes, not
    # vectors.
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    approx = similarity.topk_pq_ivf(clean, query, k=PQ_CANDIDATES)
    print("IVF-PQ candidates (approx distance):")
    approx.show(10, truncate=False)

    # Stage 4: exact cosine rerank of the PQ survivors only -- the
    # cheap-recall / expensive-precision split: exact math touches
    # PQ_CANDIDATES rows, never the corpus.
    survivors = clean.join(approx.select("vec_id"), "vec_id")
    final = similarity.topk_cosine(survivors, query, k=FINAL_K)
    print(f"final top-{FINAL_K} after exact rerank:")
    final.show(truncate=False)

    # The same shortlist->rerank split as ONE operator (since r14 the
    # documented default for unclustered corpora): fine 8x256
    # codebooks shortlist by ADC, exact cosine restores true ranking.
    # The stored-index form is search_pq_index(rerank_with=clean).
    one_call = similarity.topk_pq_rerank(
        clean, query, k=FINAL_K, n_candidates=PQ_CANDIDATES
    )
    print(f"topk_pq_rerank (one-call tier), top-{FINAL_K}:")
    one_call.show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
