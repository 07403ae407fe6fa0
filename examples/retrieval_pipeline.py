"""Document retrieval on the engine: BM25 recall + embedding rerank.

The two-stage retrieval shape every RAG / training-data-curation
stack runs, expressed entirely as DataFrame plans:

    corpus -> clean -> BM25 top-N for a term query     (lexical recall)
           -> hashing-trick embeddings for the N hits
           -> cosine rerank against the query's vector (semantic order)

Stage 1 (``text.bm25_topk``) is the inverted-index-probe plan: the
explode filters to the query terms before any aggregation, so the
keyed shuffle carries only matching postings.  Stage 2 re-embeds ONLY
the BM25 candidates (a broadcast-size frame) and reranks by cosine --
the standard cheap-recall / expensive-precision split, where the
expensive stage touches k documents instead of the corpus.

Run: python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators import (
    corpus,
    similarity,
    text,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import (
    get_spark,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.testdata import (
    load_table,
)

QUERY = ["hash", "join", "broadcast", "shuffle", "merge"]
RECALL_N = 50  # BM25 candidates
FINAL_K = 10  # reranked results
DIM = 16  # hashing-trick lanes


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="retrieval-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", text.clean_text(F.col("text")).alias("text")
    )

    # Stage 1: lexical recall -- BM25 over the whole corpus.  The
    # candidate set is consumed three times below (count, join build,
    # final join), so pin its k rows once instead of re-running the
    # corpus-wide stage per consumer.
    candidates = text.bm25_topk(docs, QUERY, k=RECALL_N).cache()
    print(f"BM25 recall set: {candidates.count()} docs")

    # Stage 2: semantic rerank -- embed ONLY the candidates (join back
    # for text, broadcast-small by construction), then exact cosine
    # against the query's own hashed vector.
    cand_docs = docs.join(F.broadcast(candidates.select("doc_id")), "doc_id")
    cand_vecs = corpus.hashing_embed(cand_docs, dim=DIM)

    # the query's vector under the SAME featurizer: run the one-row
    # "document" through hashing_embed itself, never a hand-rolled copy
    query_df = spark.createDataFrame([(0, " ".join(QUERY))], "doc_id long, text string")
    query_vec = [float(x) for x in corpus.hashing_embed(query_df, dim=DIM).first()["embedding"]]

    reranked = (
        similarity.topk_cosine(
            cand_vecs, query_vec, k=FINAL_K, vec_col="embedding", id_col="doc_id"
        )
        .join(F.broadcast(candidates), "doc_id")
        .select("doc_id", "bm25", "cosine")
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
    )
    print(f"top {FINAL_K} after rerank (bm25 recall -> cosine order):")
    for row in reranked.collect():
        print(f"  doc {row['doc_id']:>8}  bm25={row['bm25']:.3f}  cosine={row['cosine']:.3f}")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
