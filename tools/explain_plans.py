"""Dump .explain('formatted') for the engine's load-bearing plans into
PLANS.md, with the properties each plan must exhibit (pushdown, broadcast,
TakeOrderedAndProject, partition pruning, codegen spans). Run after any
plan-shaped change.

Usage: python tools/explain_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import math
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pgspark_index import ann, build, fixtures, incremental, merge, query  # noqa: E402
from pgspark_index.session import get_spark  # noqa: E402


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    spark = get_spark(app="explain", cores=4, shuffle_partitions=4)
    idx = tempfile.mkdtemp(prefix="pgspark_plans_")
    df = fixtures.make_webtext_df(spark, 800, seed=42, partitions=4)
    build.build_index(spark, df, idx, num_units=1, partitions=4, sample_fraction=1.0)
    merge.merge_index(spark, idx)

    sections = []

    # 1. query-side segments scan: term IN (...) must be a PushedFilter
    seg = (
        spark.read.parquet(build.segments_path(idx))
        .filter(F.col("term").isin(["w00001", "w00002"]))
        .select("unit", "term", "df", "postings")
    )
    sections.append(
        ("Query: segments scan with term pushdown",
         "MUST show `PushedFilters: [In(term, ...)]` and prune ReadSchema to the 4 selected columns.",
         formatted(seg))
    )

    # 2. full query: per-unit scoring + global top-k
    q = query.search(spark, idx, ["w00001", "w00002"], 10)
    sections.append(
        ("Query: end-to-end top-k",
         "MUST end in `TakeOrderedAndProject` (distributed partial top-k, no full sort) "
         "above a FlatMapGroupsInPandas scoring stage.",
         formatted(q))
    )

    # 3. build input: unit predicate pushed into the scan, ONE hash
    # exchange (on the deterministic doc stripe) + in-partition sort, NO
    # Window exec (streaming LWW dedup happens inside the tokenize stage
    # over the sorted stream) and NO range-sampling job (the stripe is a
    # pure function of doc_id — format v3)
    src = tempfile.mkdtemp(prefix="pgspark_plansrc_")
    df.write.mode("overwrite").parquet(src)
    pq_df = spark.read.parquet(src)
    provider = build.webtext_unit_provider(pq_df)
    n_stripes = build._stripes_for(4)
    shift_bits = 64 - int(math.log2(n_stripes))
    ukey = F.xxhash64("doc_id").bitwiseXOR(F.lit(-(1 << 63)))
    ded = (
        provider(0, 4)
        .select(
            "doc_id", "url",
            F.when(F.col("text").isNotNull(), F.lit(None).cast("binary"))
            .otherwise(F.col("html")).alias("html"),
            "text", "version",
        )
        .withColumn("stripe", F.shiftrightunsigned(ukey, shift_bits))
        .repartition(4, "stripe")
        .sortWithinPartitions(
            F.asc("stripe"), F.asc(F.xxhash64("doc_id")),
            F.asc("doc_id"), F.desc("version"), F.desc(F.col("text").isNotNull()),
            F.desc(F.xxhash64("text")), F.desc(F.xxhash64("html")),
        )
    )
    sections.append(
        ("Build: unit-sliced scan -> ONE hash-stripe exchange + in-partition sort",
         "The pmod(xxhash64(url)) unit predicate MUST sit directly on the scan "
         "(each unit job reads ~1/num_units of the input); exactly one Exchange "
         "(hashpartitioning on the deterministic doc stripe — no range-sampler "
         "pass) and a partition-local Sort follow — and NO Window operator: "
         "last-writer-wins dedup is a streaming keep-first mask inside the Arrow "
         "tokenize stage, which also assigns the dense doc ordinals and gets the "
         "splice-merge ordinal-disjointness invariant from this plan.",
         formatted(ded))
    )

    # 4. broadcast join from the driver registry
    li = spark.createDataFrame([(1, 10.0)], "l_partkey bigint, l_quantity double")
    part = spark.createDataFrame([(1, "B")], "p_partkey bigint, p_brand string")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).groupBy("p_brand").count()
    sections.append(
        ("Lookup join: broadcast",
         "MUST show `BroadcastHashJoin` (the injector-style dimension lookup never shuffles the fact side).",
         formatted(j))
    )

    # 5. ANN index probe: partition pruning over write-time bucket dirs
    rng = np.random.RandomState(7)
    vecs = rng.randn(300, 16)
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    ann_dir = tempfile.mkdtemp(prefix="pgspark_plans_ann_")
    ann.index_embeddings(vdf, ann_dir, num_tables=2, bits=4)
    qv = [float(x) for x in rng.randn(16)]
    probe = ann.lsh_topk(spark, ann_dir, qv, k=5)
    sections.append(
        ("ANN: multi-probe scan of the partitioned LSH index",
         "MUST show `PartitionFilters` on (tbl, bucket) — probes prune to the "
         "bucket DIRECTORIES at planning time; the data scan never touches "
         "unprobed buckets (no full scan + filter).",
         formatted(probe))
    )

    # 6. incremental compact: tombstones applied by broadcast ANTI-join
    tomb = spark.createDataFrame([(1, 9), (2, 9)], "doc_id bigint, snapshot bigint")
    docs = spark.read.parquet(build.docs_path(idx))
    kept = docs.join(F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti")
    sections.append(
        ("Incremental compact: tombstone anti-join",
         "MUST show `BroadcastHashJoin ... LeftAnti` — tombstones are never a "
         "literal IN list in the plan and never collected to the driver.",
         formatted(kept))
    )

    # 7. dedup: LSH-verified pair path — candidate generation is a banded
    # equi-join, verification joins token sets onto the PAIRS: the plan
    # must contain only hash/sort-merge equi-joins, never a cartesian
    from pgspark_index import dedup  # local import: keep top imports light

    jac = dedup.ngram_jaccard_pairs(
        pq_df.select(F.xxhash64("url").alias("doc_id"), "text"), min_jaccard=0.2
    )
    jac_plan = formatted(jac)
    assert "CartesianProduct" not in jac_plan and "BroadcastNestedLoopJoin" not in jac_plan
    sections.append(
        ("Dedup: n-gram Jaccard as a verifier over MinHash-LSH candidates",
         "MUST contain NO `CartesianProduct` / `BroadcastNestedLoopJoin` — "
         "candidates come from the banded LSH self-equi-join on (band, "
         "band_sig); exact Jaccard then equi-joins token sets onto the "
         "candidate pairs. Cost is O(|candidates| x avg tokens): linear in "
         "the corpus for a fixed dup rate, never quadratic within a block.",
         jac_plan)
    )

    # 8. multi-field build: K fields from ONE corpus scan + ONE exchange
    mf = build.multifield_tokenize_input(
        pq_df.select(F.xxhash64("url").alias("doc_id"), "text",
                     F.substring("text", 1, 40).alias("headline")),
        fields={"body": F.col("text"), "title": F.col("headline")},
        id_col="doc_id", num_units=4, unit=0, partitions=4,
    )
    mf_plan = formatted(mf)
    # count node DETAIL headers ("(1) Scan parquet") — each physical node
    # appears twice in formatted output (tree line + detail header)
    import re

    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", mf_plan, re.M))
    n_exch = len(re.findall(r"^\(\d+\) Exchange", mf_plan, re.M))
    assert n_scans == 1, f"multifield must scan once, saw {n_scans}"
    assert n_exch == 1, f"multifield must shuffle once, saw {n_exch}"
    sections.append(
        ("Multi-field build: K fields, ONE scan + ONE exchange",
         "The single-pass multi-field build (build_index_multifield) MUST "
         "show exactly one `Scan parquet` and one `Exchange` however many "
         "fields are indexed — every field column rides the same unit-sliced "
         "scan and the same hash-stripe shuffle; the per-field split "
         "downstream reads the persisted tokenize output, never the corpus "
         "again. (Asserted by this generator: 2 fields, 1 scan, 1 exchange.)",
         mf_plan)
    )

    # 9. tiered unit merge (merge_units): splice-fold plan — ONE exchange,
    # postings never decoded (two mapInArrow stages around a single hash
    # repartition on (term, salt))
    idx2 = tempfile.mkdtemp(prefix="pgspark_plans_fold_")
    build.build_index(spark, df, idx2, num_units=2, partitions=4,
                      sample_fraction=1.0)
    merge.merge_index(spark, idx2)
    from pgspark_index.build import (
        ORD_SHIFT, PARTIAL_FULL_SCHEMA, SEG_SCHEMA, _splice_merge_fn,
        make_rebase_fn,
    )

    seg_base = build.segments_path(idx2)
    fold_src = spark.read.option("basePath", seg_base).parquet(
        os.path.join(seg_base, "unit=0"), os.path.join(seg_base, "unit=1")
    )
    folded = (
        fold_src.mapInArrow(
            make_rebase_fn({0: 0, 1: 4 << ORD_SHIFT}), schema=PARTIAL_FULL_SCHEMA
        )
        .repartition(4, "term", "salt")
        .sortWithinPartitions("term", "salt", "first_doc")
        .mapInArrow(_splice_merge_fn, schema=SEG_SCHEMA)
    )
    fold_plan = formatted(folded)
    n_exch = len(re.findall(r"^\(\d+\) Exchange", fold_plan, re.M))
    assert n_exch == 1, f"fold must shuffle once, saw {n_exch}"
    sections.append(
        ("Tiered unit merge (merge_units): splice-fold, ONE exchange",
         "Folding N units into one MUST be two Arrow stages around exactly "
         "one `Exchange hashpartitioning(term, salt)`: the rebase stage "
         "patches each list's first varint (closed-form ordinal shift), the "
         "splice stage byte-concatenates the compressed blobs — postings are "
         "never decoded, so fold cost is O(segment rows + bytes), not "
         "O(postings). (Asserted by this generator: exactly 1 Exchange.)",
         fold_plan)
    )

    # 10. query DSL compiler: bool tree plan — clause joins on doc_id,
    # no cartesian product, no driver staging of clause sets
    dsl_df = query.execute_dsl(spark, idx, {"bool": {
        "must": [{"match": {"terms": ["w00001", "w00002"]}}],
        "should": [{"term": "w00003"}],
        "must_not": [{"term": "w00004"}],
        "filter": [{"term": "w00005"}],
    }}, 10)
    dsl_plan = formatted(dsl_df)
    assert "CartesianProduct" not in dsl_plan, "bool DSL must not cross-join"
    n_bnlj = dsl_plan.count("BroadcastNestedLoopJoin")
    assert n_bnlj == 0, f"bool DSL must join on doc_id only, saw {n_bnlj} BNLJ"
    sections.append(
        ("Query DSL compiler: bool tree (must+should+must_not+filter)",
         "Every clause is an independent per-unit emission; the tree "
         "combines them with equi-joins / left_semi / left_anti on doc_id "
         "and one union+groupBy for the should block. MUST contain no "
         "`CartesianProduct` or `BroadcastNestedLoopJoin` (asserted by "
         "this generator) — clause sets stay distributed end-to-end.",
         dsl_plan)
    )

    out = ["# PLANS — physical-plan evidence (generated by tools/explain_plans.py)\n"]
    for title, requirement, plan in sections:
        out.append(f"## {title}\n\n{requirement}\n\n```\n{plan}```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
