"""Positive-branch goldens for the detector ops whose flag never fires
on the synthetic corpus (round-14 flag census: `contaminated` and
`bot_suspect` are constant-false at sf0.01 AND sf1 because the corpus
genuinely contains no contamination and no bots — the clean-corpus
negative is CORRECT, but without these fixtures a detector that could
never flag anything would pass identically).

Geometry is chosen so every asserted value is exact: integer-component
vectors give rational cosines (24/25 = 0.96, 4/5 = 0.8) that survive
the 6-dp quantization bit-for-bit, and the bot rules are voted on
hand-countable event sets.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from load_datawarehouse_spark.ops.analytics import events_bot_detection
from load_datawarehouse_spark.ops.llm import contamination_embedding_check

_EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def test_embedding_contamination_flags_fire_and_max_is_over_eval_set(spark, tmp_path):
    # eval set (vec_id < 20): axis vectors e0, e1. Corpus: an exact
    # eval copy (cos 1.0), a paraphrase-close vector (cos 24/25 =
    # 0.96 >= tau 0.92), and a clean vector whose BEST eval match is
    # e1 at 4/5 = 0.8 (its e0 cosine is 0.6 — asserting 0.8 proves
    # the max runs over the whole eval set, not just the first row).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0, 0.0], 0),
        (20, [1.0, 0.0, 0.0, 0.0], 1),
        (21, [24.0, 7.0, 0.0, 0.0], 1),
        (22, [3.0, 4.0, 0.0, 0.0], 1),
    ]
    d = str(tmp_path / "sf_emb")
    spark.createDataFrame(rows, _EMB_SCHEMA).write.parquet(f"{d}/embeddings.parquet")
    got = [tuple(r) for r in contamination_embedding_check(spark, d).collect()]
    assert got == [
        (20, 1.0, True),
        (21, 0.96, True),
        (22, 0.8, False),
    ]


_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def test_bot_detection_votes_fire_exactly(spark, tmp_path):
    # user 1: textbook bot — 5 clicks, one day, exact 60 s cadence.
    #   rate 5 >= 2*1 (Y), diversity 1 <= 3 (Y), cadence modal 4/4
    #   (Y) -> 3 votes, suspect, modal share 10000 bps.
    # user 2: human — 4 events over 4 days, 4 types, distinct gaps.
    #   rate 4 >= 8 (N), diversity 4 <= 3 (N), cadence 1*5 >= 3 (Y —
    #   the cadence rule alone fires on small samples, which is WHY
    #   the composite needs 2-of-3) -> 1 vote, clean, 3333 bps.
    # user 3: rate+diversity bot with irregular cadence — 8 events,
    #   one day, 2 types, 7 distinct gaps. rate (Y), diversity (Y),
    #   cadence 1*5 >= 7 (N) -> 2 votes, suspect at exactly the
    #   threshold, 1429 bps.
    def ts(day, h, m, s=0):
        return dt.datetime(2024, 1, day, h, m, s)

    rows = []
    eid = 0
    for k in range(5):  # user 1
        eid += 1
        rows.append((eid, ts(1, 0, k), 1, "click", 0.0, "{}"))
    for day, typ, minute in [(1, "view", 0), (2, "click", 7), (3, "purchase", 21), (4, "error", 50)]:
        eid += 1
        rows.append((eid, ts(day, 1, minute), 2, typ, 0.0, "{}"))
    gaps = [1, 2, 4, 8, 16, 32, 59]  # minutes, all distinct
    m = 0
    for k in range(8):  # user 3
        eid += 1
        rows.append((eid, ts(5, m // 60, m % 60), 3, "click" if k % 2 else "view", 0.0, "{}"))
        if k < 7:
            m += gaps[k]
    d = str(tmp_path / "sf_bot")
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(f"{d}/events.parquet")
    got = [tuple(r) for r in events_bot_detection(spark, d).collect()]
    assert got == [
        (1, 5, 1, 10000, True),
        (2, 4, 4, 3333, False),
        (3, 8, 2, 1429, True),
    ]


_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def test_lang_markers_every_language_und_and_tiebreak(spark, tmp_path):
    # The corpus is English-vocabulary synthetic text regardless of
    # its lang column, so lang_id_markers legitimately only ever
    # guesses en/und there (round-14 label census). This fixture
    # fires every other branch: one doc per marker set, a
    # no-marker doc -> 'und', a doc where 'le' scores for BOTH fr and
    # zh but zh's full marker set wins, and an en/fr exact tie that
    # must break to 'en' (first in _LANG_MARKERS order, mirroring the
    # oracle's CASE order).
    from load_datawarehouse_spark.ops.llm import lang_id_markers

    rows = [
        (1, "le la et bonjour", "xx", "s", 16),
        (2, "el los y hola", "xx", "s", 13),
        (3, "der die und hallo", "xx", "s", 17),
        (4, "de shi le ni", "xx", "s", 12),  # le also scores fr; zh=3 > fr=1
        (5, "the and of hello", "xx", "s", 16),
        (6, "xyzzy plugh", "xx", "s", 11),
        (7, "the le", "xx", "s", 6),  # en=1, fr=1 tie -> en
    ]
    d = str(tmp_path / "sf_lang")
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(f"{d}/documents.parquet")
    got = [r["lang_guess"] for r in lang_id_markers(spark, d).collect()]
    assert got == ["fr", "es", "de", "zh", "en", "und", "en"]


_ORD_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


def test_mann_kendall_decreasing_and_no_trend_branches(spark, tmp_path):
    # The corpus series only ever emits 'increasing' (round-14 label
    # census); lock the other two branches with exact S statistics.
    from load_datawarehouse_spark.ops.relational import stat_mann_kendall_trend

    dec = [(k + 1, dt.datetime(2024, 1, k + 1), 300.0 - 100 * k) for k in range(3)]
    d1 = str(tmp_path / "sf_dec")
    spark.createDataFrame(dec, _ORD_SCHEMA).write.parquet(f"{d1}/orders.parquet")
    got = [tuple(r) for r in stat_mann_kendall_trend(spark, d1).collect()]
    assert got == [(3, -3, "decreasing")]

    flat = [(1, dt.datetime(2024, 1, 1), 100.0), (2, dt.datetime(2024, 1, 2), 100.0)]
    d2 = str(tmp_path / "sf_flat")
    spark.createDataFrame(flat, _ORD_SCHEMA).write.parquet(f"{d2}/orders.parquet")
    got = [tuple(r) for r in stat_mann_kendall_trend(spark, d2).collect()]
    assert got == [(1, 0, "no_trend")]


def test_sprt_ledger_crosses_both_boundaries(spark, tmp_path):
    # The corpus purchase share is ~0.2 << p0, so the ledger slams
    # into accept_h0 on day one and the 'continue' / 'accept_h1'
    # branches never fire (round-14 label census). Constructed daily
    # mixes walk the cumulative LLR through all three decisions, with
    # the expected 6-dp ledger recomputed from the op's own published
    # constants (identical double order: per-day term, then cumsum).
    from load_datawarehouse_spark.ops.analytics import (
        _SPRT_LL_CONV,
        _SPRT_LL_MISS,
        _SPRT_LOWER,
        _SPRT_UPPER,
        stats_sprt_monitoring,
    )

    days = [  # (day, n_purchase, n_view)
        (1, 6, 4),  # llr ~ +0.15 -> inside (lower, upper): continue
        (2, 28, 0),  # cum ~ +2.82 >= upper 2.7726: accept_h1
        (3, 0, 42),  # cum ~ -1.61 <= lower -1.5581: accept_h0
    ]
    rows, eid = [], 0
    for day, conv, miss in days:
        for _ in range(conv):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, day, 0, eid % 60), 1, "purchase", 1.0, "{}"))
        for _ in range(miss):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, day, 1, eid % 60), 1, "view", 0.0, "{}"))
    d = str(tmp_path / "sf_sprt")
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(f"{d}/events.parquet")

    cum, expect = 0.0, []
    for day, conv, miss in days:
        cum += conv * _SPRT_LL_CONV + miss * _SPRT_LL_MISS
        dec = ("accept_h1" if cum >= _SPRT_UPPER
               else "accept_h0" if cum <= _SPRT_LOWER else "continue")
        expect.append((f"2024-01-0{day}", conv + miss, conv, round(cum, 6), dec))
    got = [tuple(r) for r in stats_sprt_monitoring(spark, d).collect()]
    assert got == expect
    assert [r[4] for r in expect] == ["continue", "accept_h1", "accept_h0"]


def test_dq_expectations_every_rule_can_fail(spark, tmp_path):
    # The clean corpus never violates any expectation (n_failed is
    # constant 0 at every scale — round-14 numeric census), which is
    # correct but leaves the failure accounting unproven. One
    # violation per rule: a non-positive price, an FK orphan, a
    # duplicate order key, a NULL order date, and an out-of-domain
    # discount.
    from load_datawarehouse_spark.ops.relational import dq_expectations_report

    orders = [
        (1, 1, dt.datetime(2024, 1, 1), 100.0),
        (1, 1, dt.datetime(2024, 1, 2), 100.0),  # duplicate o_orderkey
        (2, 99, dt.datetime(2024, 1, 3), 50.0),  # orphan custkey
        (3, 1, None, -5.0),  # NULL date + non-positive price
    ]
    o_schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    cust = [(1,)]
    c_schema = T.StructType([T.StructField("c_custkey", T.LongType())])
    lines = [(1, 0.5), (1, 1.5)]  # one in-domain, one out
    l_schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_discount", T.DoubleType()),
        ]
    )
    d = str(tmp_path / "sf_dq")
    spark.createDataFrame(orders, o_schema).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(cust, c_schema).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(lines, l_schema).write.parquet(f"{d}/lineitem.parquet")
    got = [tuple(r) for r in dq_expectations_report(spark, d).collect()]
    assert got == [
        ("lineitem.l_discount in [0,1]", 2, 1),
        ("orders.o_custkey fk customer", 4, 1),
        ("orders.o_orderdate not null", 4, 1),
        ("orders.o_orderkey unique", 4, 1),
        ("orders.o_totalprice > 0", 4, 1),
    ]


def test_iqr_anomaly_flags_a_spike_day(spark, tmp_path):
    # Daily event volume on the corpus is uniform, so is_outlier is
    # constant 0 at every scale (round-14 numeric census). Four quiet
    # days plus one 5x spike put the spike outside q3 + 1.5*IQR.
    from load_datawarehouse_spark.ops.relational import events_anomaly_iqr

    rows, eid = [], 0
    for day in range(1, 5):
        for k in range(2):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, day, k), 1, "view", 0.0, "{}"))
    for k in range(10):
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 5, k), 1, "view", 0.0, "{}"))
    d = str(tmp_path / "sf_iqr")
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(f"{d}/events.parquet")
    got = [tuple(r) for r in events_anomaly_iqr(spark, d).collect()]
    assert got == [
        ("2024-01-01", 2, 0),
        ("2024-01-02", 2, 0),
        ("2024-01-03", 2, 0),
        ("2024-01-04", 2, 0),
        ("2024-01-05", 10, 1),
    ]


# --- round-15 identity-breaking fixtures ------------------------------------
#
# The pairwise-identical-columns census (CENSUS.json `identical_pairs`)
# found three data-model identities whose distinguishing branch had no
# Spark-side evidence: intra-doc segment dedup never drops a segment
# (the corpus has no intra-doc repeats), the token regex always equals
# whitespace words (no punctuation in corpus text), and the byte
# histogram only ever fills bins 1 and 3 (ASCII payloads). Each
# fixture constructs the input that separates the columns and asserts
# the op's output exactly.


def test_intradoc_segment_dedup_drops_repeat_and_hashes_kept_order(spark, tmp_path):
    import hashlib

    from load_datawarehouse_spark.ops.llm import dedup_intradoc_segments

    seg_a = " ".join(f"a{i}" for i in range(8))
    seg_b = " ".join(f"b{i}" for i in range(8))
    clean = " ".join(f"c{i}" for i in range(16))
    rows = [
        (1, f"{seg_a} {seg_b} {seg_a}", "en", "s0", 10),  # refrain: A B A
        (2, clean, "en", "s0", 10),
    ]
    d = str(tmp_path / "sf_seg")
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(f"{d}/documents.parquet")
    got = [tuple(r) for r in dedup_intradoc_segments(spark, d).collect()]
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got == [
        # repeated segment dropped: 3 segments, 2 kept, hash of "A B"
        (1, 3, 2, md5(f"{seg_a} {seg_b}")),
        (2, 2, 2, md5(clean)),
    ]


def test_training_prep_tokens_diverge_from_words_on_punctuation(spark, tmp_path):
    from load_datawarehouse_spark.ops.llm import pipeline_training_prep

    # 24 words incl. 2 stopwords (stop_ratio 1/12 >= 0.05) and ONE
    # apostrophe (punct_ratio ~1/130 < 0.1): all three quality checks
    # pass. The token regex splits "don't" into don/'/t (3) and each
    # alphanumeric "wN" into letter+digit runs (2 each), so
    # total_tokens = 2 + 3 + 21*2 = 47 > total_words = 24.
    words = ["the", "and", "don't"] + [f"w{i}" for i in range(21)]
    rows = [(1, " ".join(words), "en", "s0", 10)]
    d = str(tmp_path / "sf_prep")
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(f"{d}/documents.parquet")
    got = [tuple(r) for r in pipeline_training_prep(spark, d).collect()]
    assert got == [("en", 1, 24, 47)]


def test_feature_extract_nonascii_bytes_fill_other_bins(spark, tmp_path):
    from load_datawarehouse_spark.ops.multimodal import multimodal_feature_extract

    # 'é' is UTF-8 0xC3 0xA9 -> bins 6 and 5; 'A' (65) -> bin 2;
    # lowercase ASCII (97/98) -> bin 3. mean_byte is exact integer/3.
    rows = [
        (1, "ab", "en", "s0", 2),       # hist_3 = 2
        (2, "Aé", "en", "s0", 2),  # hist_2 = 1, hist_5 = 1, hist_6 = 1
    ]
    d = str(tmp_path / "sf_feat")
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: tuple(r) for r in multimodal_feature_extract(spark, d).collect()}
    assert got[1] == (1, 0, 0, 0, 2, 0, 0, 0, 0, (97 + 98) / 2)
    assert got[2] == (2, 0, 0, 1, 0, 0, 1, 1, 0, (65 + 195 + 169) / 3)
