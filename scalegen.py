"""Generate scaled-up copies of the driver testdata for scaling runs.

Replicates the sf0.1 tables by an integer factor K with key remapping
(copy ``i`` shifts every primary/foreign key by ``i * max_key``) so
join selectivities, per-key fan-outs, and group cardinalities scale the
way a real TPC-H SF increase does — not a degenerate "same keys, K x
hotter" blow-up. Dimension tables (region, nation) stay fixed, like
TPC-H itself.

Text / embedding tables are transformed per copy (a copy-keyed
pseudorandom word permutation on ``text``, a copy-unique orthogonal
transform on ``embedding``) so each copy preserves the base corpus's
INTERNAL structure while cross-copy similarity collapses — dup/near-dup
RATES stay flat as the corpus scales and the dedup ops see a
realistic, not trivially-degenerate, workload at every decade.

Output: ``.scaledata/sf{0.1*K}/*.parquet`` (gitignored). Usage:

    python scalegen.py [K]      # default K=10 -> sf1.0
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# table -> columns to shift by i * (max over the base table of the
# key's DOMAIN owner). Foreign keys shift by the owning table's max so
# referential integrity holds across copies.
_SHIFTS = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {
        "o_orderkey": "orders.o_orderkey",
        "o_custkey": "customer.c_custkey",
    },
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {"event_id": "events.event_id", "user_id": "events.user_id"},
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}
_FIXED = ("region", "nation")


def _max_keys(spark: SparkSession) -> dict[str, int]:
    out: dict[str, int] = {}
    for table, cols in _SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        for owner in set(cols.values()):
            if owner not in out:
                t, c = owner.split(".")
                src = df if t == table else spark.read.parquet(f"{SRC}/{t}.parquet")
                out[owner] = src.agg(F.max(c)).collect()[0][0]
    return out


def _replicate(df: DataFrame, table: str, k: int, maxes: dict[str, int]) -> DataFrame:
    copies = df.sparkSession.range(k).withColumnRenamed("id", "_copy")
    out = df.crossJoin(F.broadcast(copies))
    for col, owner in _SHIFTS.get(table, {}).items():
        dtype = dict(df.dtypes)[col]
        # stride = max + 1: with base keys spanning [0, max], a stride
        # of exactly max makes copy i's top key COLLIDE with copy
        # i+1's bottom key (k-1 duplicate ids per table at k copies —
        # found round 6 when duplicate doc_ids made every
        # keep-first/row_number tie-break engine-dependent at sf1)
        out = out.withColumn(
            col, (F.col(col) + F.col("_copy") * F.lit(maxes[owner] + 1)).cast(dtype)
        )
    if table == "documents":
        # copy 0 stays byte-identical; later copies get a copy-keyed
        # PSEUDORANDOM WORD PERMUTATION (sort positions by
        # xxhash64(pos, copy)). Three properties make this the right
        # replication for dedup workloads:
        #   1. word MULTISETS are preserved, so every unigram-based op
        #      (tf-idf stats, zipf, token counts, language ID, BM25)
        #      sees each copy as a legitimate same-distribution doc;
        #   2. the permutation is keyed by POSITION and COPY, not the
        #      words, so every doc within one copy gets the same
        #      reordering — base near-dup pairs of equal length stay
        #      near-dups inside each copy (flat intra-copy structure,
        #      exactly like the embeddings' per-copy orthogonal
        #      transform);
        #   3. two independent permutations share an expected ~2/n
        #      consecutive triples, so CROSS-copy shingle overlap is
        #      ~zero and the near-dup rate per doc stays FLAT as the
        #      corpus scales.
        # The pre-round-12 scheme ROTATED the word array, which moves
        # only the ~2 seam shingles and leaves Jaccard ~1-4/n: every
        # copy was a near-dup of its source (measured: 88k jaccard
        # pairs at sf1 vs 256 at sf0.1), and at K=100 the 100-copy
        # cliques pushed every intra-doc shingle's DF over the
        # absolute MAX_SHINGLE_DF cap — the sf10 inverted index
        # collapsed to ZERO candidates, making second-decade slopes
        # unreadable. Exact dups in the base corpus stay exact dups in
        # every copy (same words, same length -> same permutation), so
        # the exact-dup RATE is flat too.
        words = F.split(F.col("text"), " ")
        shuffled = F.transform(
            F.array_sort(
                F.transform(
                    words,
                    lambda w, i: F.struct(
                        F.xxhash64(i, F.col("_copy")).alias("k"),
                        i.alias("i"),
                        w.alias("w"),
                    ),
                )
            ),
            lambda s: s["w"],
        )
        out = out.withColumn(
            "text",
            F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                F.array_join(shuffled, " ")
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        # copy 0 stays byte-identical; later copies get a copy-unique
        # ORTHOGONAL transform — cyclic dimension shift by copy%64,
        # plus a sign flip on odd dims for copies >= 64 (injective up
        # to 128 copies). Orthogonal means every copy preserves the
        # base corpus's INTERNAL geometry exactly (norms, intra-copy
        # cosines, label-cluster structure) while cross-copy cosine
        # collapses to a lag cross-correlation far below any near-dup
        # threshold — so the near-dup RATE per vector stays flat as
        # the corpus scales. (The pre-round-12 scheme added a
        # copy%7-keyed 1e-3 epsilon, which left every copy a mutual
        # near-dup of its source: fine as a documented output-growth
        # workload at K=10, but at K=100 it makes each vector a
        # 100-clique — ~4950 true pairs per base vector — turning the
        # second scale decade into a pure workload blow-up no engine
        # slope could be read from.)
        dim = 64
        shift = F.col("_copy") % dim
        flip = F.col("_copy") >= dim
        shifted = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.element_at(
                    F.col("embedding"),
                    (F.pmod(j + shift, F.lit(dim)) + 1).cast("int"),
                )
                * F.when(flip & (j % 2 == 1), F.lit(-1.0)).otherwise(F.lit(1.0))
            ).cast("float"),
        )
        out = out.withColumn(
            "embedding",
            F.when(F.col("_copy") == 0, F.col("embedding")).otherwise(shifted),
        )
    if table == "events":
        # spread copies over time so windowed aggs scale in key-space,
        # not by stacking K events on identical timestamps
        out = out.withColumn(
            "ts", F.col("ts") + F.make_dt_interval(F.lit(0), F.col("_copy") % 24)
        )
    return out.drop("_copy")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf = round(0.1 * k, 2)
    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scaledata", f"sf{sf}")
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)

    from load_datawarehouse_spark.session import get_spark

    spark = get_spark(app_name="scalegen")
    spark.sparkContext.setLogLevel("ERROR")
    maxes = _max_keys(spark)
    for table in list(_SHIFTS) + list(_FIXED):
        src = f"{SRC}/{table}.parquet"
        out = f"{dest}/{table}.parquet"
        df = spark.read.parquet(src)
        if table in _FIXED:
            shutil.copyfile(src, out)
            print(f"{table}: copied (dimension)", flush=True)
            continue
        reps = max(1, min(32, (df.count() * k) // 200_000))
        tmp = out + ".dir"
        _replicate(df, table, k, maxes).repartition(int(reps)).write.mode(
            "overwrite"
        ).parquet(tmp)
        # driver layout is one file per table-name path; a directory of
        # part-files under the .parquet name works for both Spark and
        # DuckDB ('<path>/**' globbing not needed: both read dirs)
        os.rename(tmp, out)
        n = spark.read.parquet(out).count()
        print(f"{table}: {n} rows -> {out}", flush=True)


if __name__ == "__main__":
    main()
