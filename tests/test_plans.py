"""Physical-plan regression tests (SCALE.md evidence).

A correct result from a bad plan is a latent 100 TB outage; these pin
the plan shapes we designed for: broadcast joins on the flagship,
parquet pushdown + pruning, partial aggregation, top-k without global
sort."""

from __future__ import annotations

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.catalog import (
    CATALOG,
)

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_flagship_is_all_broadcast_joins(spark):
    plan = plan_of(CATALOG["purchase_summary"][0](spark, SF), mode="simple")
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan
    # fact side must not be exchanged (only the 4 dim broadcasts)
    assert plan.count("BroadcastExchange") == 4
    assert "Exchange hashpartitioning" not in plan


def test_filter_pushdown_and_column_pruning(spark):
    plan = plan_of(CATALOG["filter_eq"][0](spark, SF))
    assert "EqualTo(l_returnflag,R)" in plan  # predicate reached parquet
    # projection pruned to exactly the 5 needed columns in the scan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"):
        assert col in read_schema
    assert "l_shipdate" not in read_schema and "l_tax" not in read_schema


def test_aggregation_is_partial_then_final(spark):
    plan = plan_of(CATALOG["pricing_summary"][0](spark, SF), mode="simple")
    # map-side partial + final hash aggregate around a single shuffle
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_top1_uses_takeordered(spark):
    plan = plan_of(CATALOG["top1_supplier"][0](spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan  # per-partition top-k, no global Sort


def test_semi_join_is_a_join_not_inlist(spark):
    plan = plan_of(CATALOG["semi_join"][0](spark, SF), mode="simple")
    assert "LeftSemi" in plan  # never a driver-materialized IN list


def test_latest_per_key_single_shuffle(spark):
    plan = plan_of(CATALOG["latest_per_key"][0](spark, SF), mode="simple")
    # one hash-partitioning exchange on the window key, nothing else
    assert plan.count("Exchange") == 1
    assert "Window" in plan

def test_window_pack_single_shuffle(spark):
    # lag/lead/row_number/running-sum must share ONE window exchange
    plan = plan_of(CATALOG["window_analytics"][0](spark, SF), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_single_shuffle(spark):
    plan = plan_of(CATALOG["sessionize"][0](spark, SF), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_is_union_not_range_join(spark):
    # the union trick: no join operator at all in the merged timeline --
    # a BroadcastNestedLoopJoin/range join here would explode at scale
    plan = plan_of(CATALOG["asof_last_order"][0](spark, SF), mode="simple")
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Union" in plan


def test_rollup_is_expand_plus_partial_agg(spark):
    plan = plan_of(CATALOG["rollup_pricing"][0](spark, SF), mode="simple")
    assert "Expand" in plan  # one pass generates all grouping sets
    assert plan.count("Exchange hashpartitioning") == 1


def test_q5_all_dims_broadcast(spark):
    plan = plan_of(CATALOG["q5_region_volume"][0](spark, SF), mode="simple")
    # supplier/customer/nation/region all broadcast; at sf0.001 orders
    # broadcasts too under AQE -- the invariant is NO sort-merge join
    # and no more than one fact-side hash exchange (the final agg's)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_topk_per_group_no_single_reducer_sort(spark):
    plan = plan_of(CATALOG["topk_per_group"][0](spark, SF), mode="simple")
    # two window stages (salted then global), never a global Sort over
    # the whole input without partitioning
    assert plan.count("+- Window ") == 2
    # stage-1 sort is per (group, salt) partition
    assert "__salt" in plan
    # Spark >= 3.5 additionally pushes partial WindowGroupLimit before
    # each exchange -- map-side truncation to k rows per group
    assert plan.count("WindowGroupLimit") >= 2


def test_decontaminate_broadcasts_benchmark_grams(spark):
    plan = plan_of(CATALOG["decontaminate"][0](spark, SF), mode="simple")
    # the benchmark gram set rides a broadcast; the train side is never
    # shuffled for the contamination check itself
    assert "BroadcastHashJoin" in plan


def test_unpivot_is_expand_no_shuffle(spark):
    plan = plan_of(CATALOG["unpivot_metrics"][0](spark, SF), mode="simple")
    assert "Expand" in plan
    assert "Exchange" not in plan


def test_corpus_split_zero_shuffle(spark):
    plan = plan_of(CATALOG["corpus_split"][0](spark, SF), mode="simple")
    assert "Exchange" not in plan  # pure projection


def test_sequence_pack_single_shuffle(spark):
    # the packer must be one partition-local window shuffle -- a global
    # (unpartitioned) window would serialize the corpus through one task
    plan = plan_of(CATALOG["sequence_pack"][0](spark, SF), mode="simple")
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan


def test_token_budget_single_shuffle(spark):
    plan = plan_of(CATALOG["token_budget"][0](spark, SF), mode="simple")
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan


def test_mixture_sample_no_shuffle(spark):
    # hash-gated sampling is a pure scan filter: zero exchanges
    plan = plan_of(CATALOG["mixture_sample"][0](spark, SF), mode="simple")
    assert "Exchange" not in plan


def test_q19_or_arms_push_into_both_scans(spark):
    # Catalyst must distribute the OR-of-ANDs so each side's scan gets
    # its own pushed disjunction (quantity bands -> lineitem, brand/size
    # -> part); a plan filtering only post-join reads everything
    plan = plan_of(CATALOG["q19_banded_revenue"][0](spark, SF))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l and "Or(" in l for l in pushed)
    assert any("p_brand" in l and "Or(" in l for l in pushed)


def test_chunk_documents_is_map_only(spark):
    # sequence + posexplode + substring: pure row expansion, zero
    # exchanges -- chunking at 100 TB must stay a map-only stage
    plan = plan_of(CATALOG["chunk_documents"][0](spark, SF), mode="simple")
    assert "Exchange" not in plan


def test_q4_exists_is_hash_semi_join(spark):
    # EXISTS with a cross-table inequality must stay a hash semi join
    # (equi key probe + inequality as residual), never a nested loop
    plan = plan_of(CATALOG["q4_priority_count"][0](spark, SF), mode="simple")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q6_predicates_reach_the_scan(spark):
    plan = plan_of(CATALOG["q6_forecast_revenue"][0](spark, SF))
    pushed = " ".join(l for l in plan.splitlines() if "PushedFilters" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed into the parquet scan"


def test_catalog_registry_integrity(spark):
    """Guard the gate machinery itself: every _GATE_TAIL name must
    exist (a typo would silently shrink the tail and push entries out
    of the driver's first-50 window), every entry is a (fn, sql) pair,
    and the head holds exactly 50 entries."""
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.catalog import (
        _GATE_TAIL,
    )

    names = list(CATALOG)
    missing = [n for n in _GATE_TAIL if n not in CATALOG]
    assert not missing, f"_GATE_TAIL names not in CATALOG: {missing}"
    assert len(names) - len(_GATE_TAIL) == 50, (
        f"gate head is {len(names) - len(_GATE_TAIL)} entries, not 50 -- "
        "the self-computing rotation (plans/catalog.py) is broken"
    )
    assert names[-len(_GATE_TAIL):] == list(_GATE_TAIL)
    for name, (fn, sql) in CATALOG.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name


def test_purchase_summary_broadcast_is_size_gated(spark):
    """The IVM view definition must not force-broadcast a large dim
    (VERDICT r4 item 5): parquet-backed small dims get the hint, frames
    with oversized or unknown statistics fall back to AQE's choice, and
    True/False override in both directions."""
    from pyspark.sql import functions as F

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.plans.purchase_summary import (
        DIM_BROADCAST_BYTES,
        _gated_broadcast,
        customer_purchase_summary,
    )
    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.testdata import (
        load_table,
    )

    # parquet-backed small table: stats known and tiny -> hinted
    nation = load_table(spark, SF, "nation")
    hinted = _gated_broadcast(nation, None)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()

    # oversized estimate -> returned unhinted (AQE decides at runtime)
    big = spark.range(0, DIM_BROADCAST_BYTES).select(
        F.col("id").alias("merchant_id"),
        F.lit("food").alias("merchant_category"),
        F.lit("m").alias("merchant_name"),
    )
    assert _gated_broadcast(big, None) is big

    tx = spark.createDataFrame(
        [(1, 10, 20, 30, "2024-01-01", "12:00", 2, 9.0, "visa", "food")],
        "transaction_id long, customer_id long, product_id long, merchant_id long,"
        " transaction_date string, transaction_time string, quantity long,"
        " total_price double, transaction_card string, transaction_category string",
    )
    cust = spark.createDataFrame([(10, 33)], "customer_id long, age long")
    prod = spark.createDataFrame(
        [(20, "apple", "food", 4.5)],
        "product_id long, product_name string, product_category string, price double",
    )
    small_merch = spark.createDataFrame(
        [(30, "bob's", "food")],
        "merchant_id long, merchant_name string, merchant_category string",
    )

    # RDD-backed frames report unknown stats: the auto gate must stay
    # conservative (no forced hint anywhere in the optimized plan)
    auto = customer_purchase_summary(tx, cust, prod, small_merch)
    assert "ResolvedHint" not in auto._jdf.queryExecution().optimizedPlan().toString()
    assert auto.count() == 1  # and still correct

    # broadcast_dims=True restores the reference-domain forced plan
    forced = customer_purchase_summary(tx, cust, prod, small_merch, broadcast_dims=True)
    assert plan_of(forced, mode="simple").count("BroadcastHashJoin") == 3

    # broadcast_dims=False never hints, even for tiny parquet dims
    assert _gated_broadcast(nation, False) is nation


def test_event_transitions_two_keyed_exchanges(spark):
    plan = plan_of(CATALOG["event_transitions"][0](spark, SF), mode="simple")
    # user-keyed window shuffle + pair-count shuffle; the probability
    # window runs over the O(types^2) aggregate, never the event stream
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "Exchange SinglePartition" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final pair count


def test_anomaly_days_window_over_days_not_events(spark):
    plan = plan_of(CATALOG["anomaly_days"][0](spark, SF), mode="simple")
    # the day count aggregates BEFORE the unpartitioned window, so the
    # single-partition exchange carries O(days) rows, not events
    lines = plan.splitlines()
    sp = next(i for i, l in enumerate(lines) if "Exchange SinglePartition" in l)
    agg_below = any("HashAggregate" in l for l in lines[sp:])
    assert agg_below, "daily aggregation must run below the global window"
    assert plan.count("Exchange SinglePartition") == 1
    # zero-fill rides the aggregated frame's lag, never a second pass
    # over the source (a min/max-bounds subtree would scan events twice)
    assert sum("FileScan" in l for l in lines) == 1


def test_repeated_spans_two_keyed_exchanges_no_joins(spark):
    """Round-6 shape: Arrow gram stage -> posexplode -> gram-count
    window partitioned on (xxhash64(gram), gram) -> per-doc
    gaps-and-islands window -> span agg that REUSES the doc_id
    partitioning.  Two exchanges total, zero joins, pruned scan."""
    plan = plan_of(CATALOG["repeated_spans"][0](spark, SF), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan  # no self-join formulation crept back
    assert "ArrowEvalPython" in plan  # the vectorized gram builder
    # the gram window sorts longs first (hash prefix in the key)
    assert "xxhash64" in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "text" in read_schema and "lang" not in read_schema


def test_bloom_decontaminate_single_broadcast_no_hash_joins(spark):
    """Round-6 shape: the dense bitmap rides ONE 1-row broadcast
    nested-loop join; the BLOOM_K probes are codegen element_at
    lookups, so no per-probe BroadcastHashJoin remains and the train
    side has exactly one exchange (the per-doc count)."""
    plan = plan_of(CATALOG["bloom_decontaminate"][0](spark, SF), mode="simple")
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "BroadcastHashJoin" not in plan
    assert plan.count("BroadcastExchange") == 1


def test_q11_total_is_single_row_broadcast(spark):
    """Q11 shape: the global total joins back as a 1-row broadcast
    (BroadcastNestedLoopJoin), never a per-row subquery or a shuffled
    join; the scan is pruned to the 3 needed columns, and although the
    grouped aggregate appears in both branches, the EXECUTED plan
    dedupes it (ReusedExchange) so the fact is scanned and shuffled
    exactly once."""
    df = CATALOG["q11_important_parts"][0](spark, SF)
    plan = plan_of(df, mode="simple")
    assert plan.count("BroadcastNestedLoopJoin") == 1
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_partkey" in read_schema and "l_shipdate" not in read_schema
    df.collect()  # AQE exchange reuse only shows in the executed plan
    executed = plan_of(df, mode="simple")
    final = executed.split("+- == Initial Plan ==")[0]
    assert "ReusedExchange" in final
    assert final.count("FileScan parquet") == 1


def test_q21_quantifiers_are_hash_joins(spark):
    """Q21 shape: EXISTS decorrelates to a LeftSemi and NOT EXISTS to
    a LeftAnti, both equi hash joins on orderkey with the supplier
    inequality as a post-probe filter -- never a nested-loop over
    order groups, and no CartesianProduct anywhere."""
    plan = plan_of(CATALOG["q21_waiting_suppliers"][0](spark, SF), mode="simple")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the order-status filter reaches the orders scan
    assert "EqualTo(o_orderstatus,F)" in plan


def test_global_sort_uses_range_partitioning(spark):
    """Total-order sort must go through Exchange rangepartitioning
    (sampled bounds, per-partition sorts) -- never a single-partition
    global sort and never a TakeOrdered (there is no limit)."""
    plan = plan_of(CATALOG["global_sort"][0](spark, SF), mode="simple")
    assert "Exchange rangepartitioning" in plan
    assert "SinglePartition" not in plan
    assert "TakeOrderedAndProject" not in plan


def test_bm25_single_corpus_scan_for_postings(spark):
    """BM25 (r14): ONE tokenize pass total.  The doc-length +
    query-token projection is localCheckpointed, so the executed query
    plan reads the materialized frame (Scan ExistingRDD) and touches
    the corpus parquet ZERO times -- corpus stats and postings both
    derive from the checkpoint instead of re-running the interpreted
    tokens() HOF over the text column."""
    df = CATALOG["bm25_topk"][0](spark, SF)
    df.collect()
    executed = plan_of(df, mode="simple")
    final = executed.split("+- == Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 0
    assert "Scan ExistingRDD" in final


def test_pq_topk_codegen_scoring_takeordered(spark):
    """PQ scoring must stay a single pass: one FileScan, ONE
    ArrowEvalPython (the vectorized encode), the distance as codegen
    element_at lookups (no per-row Python), and TakeOrderedAndProject
    for the top-k -- never a global sort or an exchange."""
    plan = plan_of(CATALOG["pq_topk"][0](spark, SF), mode="simple")
    assert plan.count("FileScan parquet") == 1
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert plan.count("element_at") == 4  # m=4 table lookups, codegen
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_semantic_dedup_single_cell_shuffle(spark):
    """Semantic dedup is ONE keyed exchange (groupBy cell feeding the
    in-kernel verdict pass) -- no self-join, no second exchange, no
    broadcast of a pair set."""
    plan = plan_of(CATALOG["semantic_dedup"][0](spark, SF), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_pq_ivf_prunes_before_scoring(spark):
    """IVF-PQ: the probed-cell filter must sit between the assignment
    and the scorer (pruning happens before any distance math), and the
    whole path stays exchange-free like the flat PQ scan."""
    plan = plan_of(CATALOG["pq_topk_ivf"][0](spark, SF), mode="simple")
    # two Arrow passes (cell assignment, code encode) with the
    # probed-cell IN filter between them
    assert plan.count("ArrowEvalPython") == 2
    assert " IN (" in plan
    assert plan.index("Filter") > plan.index("TakeOrderedAndProject")  # filter deeper than the top-k
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_is_takeordered_scan(spark):
    """A-ES weighted sampling must be one scan + map-side partial
    top-k -- no global sort exchange, no join."""
    plan = plan_of(CATALOG["weighted_sample"][0](spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_triangle_count_no_cartesian(spark):
    """Wedge join + closing semi-join are keyed equi-joins end to end;
    a CartesianProduct here would be the all-pairs scale killer."""
    plan = plan_of(CATALOG["triangle_count"][0](spark, SF), mode="simple")
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan  # the closing-edge probe


def test_pagerank_no_cartesian_and_keyed_joins(spark):
    """Every per-iteration join is keyed on the vertex id; the only
    nested-loop is the 1-row N broadcast."""
    plan = plan_of(CATALOG["pagerank"][0](spark, SF), mode="simple")
    assert "CartesianProduct" not in plan


def test_basket_rules_broadcasts_order_count(spark):
    plan = plan_of(CATALOG["basket_rules"][0](spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_basket_rules_mirrored_pairs_reuse_the_exchange(spark):
    """r14 row 12: co-occurrence is counted over ordered a<b pairs only
    and mirrored via a projection union; the initial plan prints the
    union branch as a duplicate explode+aggregate subtree, but the
    EXECUTED plan must dedup it (ReusedExchange on the pair exchange)
    so the basket explode and partial aggregate run exactly once."""
    df = CATALOG["basket_rules"][0](spark, SF)
    plan = plan_of(df, mode="simple")
    assert "Union" in plan
    df.collect()  # AQE exchange reuse only shows in the executed plan
    executed = plan_of(df, mode="simple")
    final = executed.split("+- == Initial Plan ==")[0]
    assert "ReusedExchange" in final


def test_corpus_filter_single_scan_single_shuffle(spark):
    # r9 fusion: quality+language+md5 in ONE projection of ONE scan,
    # gates filtered BEFORE the keeper window -- a second documents
    # scan or join exchange here is the r8 three-scan regression
    plan = plan_of(CATALOG["corpus_filter"][0](spark, SF), mode="simple")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan


def test_dedup_keep_best_single_scan_single_shuffle(spark):
    plan = plan_of(CATALOG["dedup_keep_best"][0](spark, SF), mode="simple")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan


def test_sequence_pack_global_never_single_partition(spark):
    # global-order packing must NOT serialize the corpus through an
    # unpartitioned window: the visible plan is the per-partition-id
    # window (one hash exchange); the range exchange sits behind the
    # prefix-sum checkpoint
    plan = plan_of(CATALOG["sequence_pack_global"][0](spark, SF), mode="simple")
    assert "SinglePartition" not in plan
    assert plan.count("Exchange") == 1


def test_funnel_two_exchanges(spark):
    # greedy single-pass funnel: one user-keyed exchange + the final
    # global aggregate (partial-agg reduced) -- the r8 chained-frontier
    # union paid a join+agg exchange pair PER STEP
    plan = plan_of(CATALOG["funnel"][0](spark, SF), mode="simple")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 2


def test_quality_topfrac_single_scan(spark):
    # stratum rides quality_score's extra= projection: ONE corpus scan
    # + the per-stratum rank window's exchange (the old form joined
    # the scored frame back to the corpus on the id -- a second scan
    # and two join shuffles for a per-row computation)
    plan = plan_of(CATALOG["quality_topfrac"][0](spark, SF), mode="simple")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1


def test_lsh_token_table_not_redistincted(spark):
    # The exploded (doc_id, token) table is unique by construction
    # (per-row array_distinct / distinct gram build), so the LSH engine
    # must not pay a cross-partition distinct of it: the only exchanges
    # keyed on the token table are the per-doc signature aggregate
    # (doc_id) and the candidate-pair dedup (doc_a, doc_b).
    import re

    for entry in ("ngram_jaccard_dup", "minhash_near_dup"):
        plan = plan_of(CATALOG[entry][0](spark, SF), mode="simple")
        assert not re.search(r"hashpartitioning\(doc_id#\d+L?, token#", plan), entry


def test_shuffle_shards_single_exchange(spark):
    # the deterministic shard shuffle is ONE hash exchange on shard
    # (the window's partitioning) over one scan -- no extra sort-merge
    # or re-exchange; rerun-stability comes from the hash, not a
    # second pass
    plan = plan_of(CATALOG["shuffle_shards"][0](spark, SF), mode="simple")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "Exchange hashpartitioning" in plan


def test_q2_broadcast_dims_no_nested_loop(spark):
    # correlated-MIN shape: supplier/nation/region/part dims broadcast,
    # the decorrelated per-part MIN re-join is a hash join -- nothing
    # quadratic, no cartesian edge
    plan = plan_of(CATALOG["q2_min_cost_supplier"][0](spark, SF), mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    # r14: the part filter is pushed BELOW both aggregates as a
    # broadcast semi-join on lineitem -- the supply rollup and min-cost
    # shuffles carry only qualifying partkeys.  The semi-join must sit
    # under an aggregate in the tree (root-side operators print first),
    # not above them where the filter used to run.
    assert "LeftSemi" in plan
    assert plan.index("LeftSemi") > plan.index("HashAggregate")


def test_q9_broadcast_dims_no_nested_loop(spark):
    # profit rollup: part (LIKE-filtered), supplier, nation broadcast;
    # lineitem never exchanged for them (only the orders join + final
    # aggregate shuffle)
    plan = plan_of(CATALOG["q9_product_profit"][0](spark, SF), mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_q20_semi_joins_hash_based(spark):
    # nested semi-join vs correlated half-sum: both IN-subqueries are
    # hash semi-joins (part filter broadcast), the half-sum compare is
    # a co-partitioned rollup join -- no nested-loop anywhere
    plan = plan_of(CATALOG["q20_half_volume_suppliers"][0](spark, SF), mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
