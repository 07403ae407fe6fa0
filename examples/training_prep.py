"""Corpus -> training-shards pipeline on the engine.

The stage AFTER cleaning/dedup (examples/corpus_pipeline.py) and
BEFORE a training run:

    clean corpus -> learned quality gate (trained classifier, scored
                    via the zero-shuffle codegen fold)
                 -> mixture sampling (per-source keep rates)
                 -> per-language token-budget selection (best-first)
                 -> deterministic train/val/test split
                 -> sequence packing (fixed-token-length rows)
                 -> checksummed shard export (one file per shard,
                    manifest verified after the write)
                 -> BPE vocabulary learned on the TRAIN split only
                    (no val/test leakage into the tokenizer), then
                    applied corpus-wide

Everything is hash-deterministic: re-running any stage after a
failure, appending new data, or changing the shard count of the
OUTPUT never changes which documents were kept or where a document
was packed -- the property that makes a 100 TB ingestion resumable.

Run: python examples/training_prep.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators import (
    bpe,
    corpus,
    evaluation,
    quality_model,
    training,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import (
    get_spark,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.testdata import (
    load_table,
)


def main(sf_dir: str, out_dir: str) -> None:
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")

    # 0. learned quality gate: weak-label the corpus with the heuristic
    #    score's confident bands, train a logistic regression on token
    #    counts (distributed LBFGS), export the per-token weights, and
    #    gate the corpus with the codegen fold -- training is a sample-
    #    sized ml job, scoring is one corpus scan with zero shuffle
    labeled = quality_model.weak_labels(docs)
    vocab = quality_model.top_vocabulary(docs, size=64)
    weights, bias = quality_model.train_token_weights(labeled, vocab)
    scored = quality_model.linear_token_score(
        docs, weights, bias, extra={c: F.col(c) for c in docs.columns if c != "doc_id"}
    )
    # calibrate the gate as a BUDGET (keep the best ~85%), not a magic
    # score: one approxQuantile pass turns the budget into the scalar
    # threshold the zero-shuffle filter needs
    thr = quality_model.threshold_for_keep_rate(scored, keep_rate=0.85)
    # evaluate BEFORE trusting the gate: distributed ROC-AUC against
    # the weak labels (no global sort -- two-phase prefix sums) and
    # precision at the gate-sized k close the train -> select loop
    heldout = scored.join(labeled.select("doc_id", "label"), "doc_id")
    auc = evaluation.roc_auc(heldout)
    pr = {
        r["k"]: round(r["precision"], 3)
        for r in evaluation.precision_recall_at_k(heldout, ks=[50, 200]).collect()
    }
    docs = scored.filter(F.col("clf_score") >= thr).drop("clf_score")
    print(
        f"classifier gate kept {docs.count()} docs "
        f"(vocab={len(vocab)}, threshold {thr:.3f} for 85% budget, "
        f"AUC {auc:.3f} vs weak labels, precision@k {pr})"
    )

    # 1. mixture: keep all of src1*, half of the other low-numbered
    #    sources, a quarter of src5-9, ~10% of the rest
    mixed = training.mixture_sample(
        docs,
        [("src1", 256), ("src0", 128), ("src2", 128), ("src3", 128), ("src4", 128)],
        default_threshold=64,
    )
    # (the rate-SOLVING variant -- "make the language mix exactly
    # 50/25/25 without upsampling" -- is corpus.mixture_to_proportions;
    # rate_thresholds above are the fixed-keep-rate form)

    # 2. token budget per (language, shard): best-first by length
    kept = training.token_budget_select(mixed, budget_per_shard=5000, n_shards=8)
    selected = mixed.join(kept.select("doc_id"), "doc_id", "left_semi")

    # 3. deterministic split, then pack each split separately (val/test
    #    sequences must never mix with train), then SHUFFLE the packed
    #    docs into output shards -- training wants random order, but a
    #    rerun or single-shard backfill must produce byte-identical
    #    shards, so the shuffle is a pure hash of (seed, doc_id)
    split = corpus.assign_split(selected)
    for part in ("train", "val", "test"):
        sub = split.filter(F.col("split") == part)
        packed = training.sequence_pack(sub, max_len=512, n_shards=8)
        out = (
            sub.join(packed.withColumnRenamed("shard", "pack_shard"), "doc_id")
            .select("doc_id", "pack_shard", "seq_id", "n_tok", "source", "lang", "text")
        )
        shuffled = training.shuffle_shards(out, n_shards=8, seed=f"demo-{part}")
        path = os.path.join(out_dir, part)
        manifest = training.export_shards(shuffled, path)
        report = training.verify_shards(spark, path)
        assert report["ok"], report
        n_seqs = shuffled.select("pack_shard", "seq_id").distinct().count()
        print(
            f"{part}: {manifest['total_rows']} docs packed into {n_seqs} "
            f"sequences -> {path} ({manifest['n_shards']} verified shards)"
        )

    # 3b. split governance: in production the split is the LEAKAGE-SAFE
    #     one (near-dup clusters share a side) maintained incrementally;
    #     merges across sides quarantine docs (sticky within an epoch),
    #     split_health watches the cost, and once its threshold trips the
    #     owner re-splits under a fresh epoch salt -- quarantine drains
    #     to zero while the cluster-shares-one-split invariant holds.
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators import (
        dedup,
    )

    pairs = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.6)
    state = corpus.leakage_safe_split_state(docs, pairs)
    # a later increment delivers a dup edge BETWEEN two docs already on
    # different sides -- the merge quarantines the flipped doc instead
    # of moving it across the wall (quarantine only ever arises from
    # increments; a freshly built state has none)
    by_split = {
        r["split"]: r["doc_id"]
        for r in state.filter(F.col("split").isin("train", "test")).collect()
    }
    if not {"train", "test"} <= by_split.keys():
        # the hash split is corpus-dependent; pointing this demo at a
        # tiny or skewed corpus can leave one side empty, and then
        # there is no cross-split pair to quarantine -- skip the merge
        # demo instead of KeyError-ing on the missing side
        print("3b skipped: corpus has an empty train or test split")
    else:
        merge_edge = spark.createDataFrame(
            [(by_split["train"], by_split["test"])], "doc_a long, doc_b long"
        )
        state = corpus.leakage_safe_split_increment(
            state, spark.createDataFrame([], "doc_id long"), merge_edge
        )
        all_pairs = pairs.select("doc_a", "doc_b").unionByName(merge_edge)
        # ops policy for the demo: ANY quarantine triggers a re-split
        health = corpus.split_health(state, all_pairs, resplit_threshold=1e-9)
        print(
            f"split health after cross-split merge: "
            f"straddling={health['straddling_pairs']} "
            f"quarantined={health['quarantined']} "
            f"resplit_recommended={health['resplit_recommended']}"
        )
        assert health["straddling_pairs"] == 0 and health["quarantined"] > 0
        if health["resplit_recommended"]:
            state = corpus.resplit_epoch(docs, all_pairs, salt="epoch-2")
            health = corpus.split_health(state, all_pairs)
            print(
                f"after epoch re-split: straddling={health['straddling_pairs']} "
                f"quarantined={health['quarantined']}"
            )
        assert health["straddling_pairs"] == 0 and health["quarantined"] == 0

    # 4. tokenizer prep: learn a BPE vocabulary on the train split only
    #    (tokenizers trained on val/test leak them into the model), then
    #    tokenize a sample with it
    train_docs = split.filter(F.col("split") == "train")
    merges = bpe.learn_bpe(train_docs, num_merges=12, merges_per_round=4)
    print(f"BPE merges learned on train split: {[(a, b) for a, b, _ in merges]}")
    (
        bpe.apply_bpe(train_docs.limit(3), merges)
        .select("doc_id", F.slice("bpe_tokens", 1, 12).alias("first_tokens"))
        .show(truncate=False)
    )

    spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="training_prep_")
    main(sf, out)
