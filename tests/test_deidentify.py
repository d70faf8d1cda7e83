"""Primitive de-identification transforms (operators/deidentify.py) —
the non-crypto members of the PrimitiveTransformation oneof the
reference's ColumnTransform embeds (auto_tokenize_messages.proto:203-205),
plus DLP-style risk metrics (operators/risk.py)."""

import datetime

import pytest
from pyspark.sql import Row, functions as F

from auto_data_tokenize_spark.operators import risk
from auto_data_tokenize_spark.operators.deidentify import (
    apply_whole_value_transform,
    char_mask,
    date_shift,
    fixed_size_buckets,
    free_form_repl,
    time_part,
    value_buckets,
)
from auto_data_tokenize_spark.operators.dlp_config import (
    apply_encrypt_config,
    parse_encrypt_config,
)


@pytest.fixture(scope="module")
def vals(spark):
    def run(col_expr, data, schema="v string"):
        df = spark.createDataFrame(data, schema)
        return [r.out for r in df.select(col_expr.alias("out")).collect()]

    return run


# ---------------------------------------------------------------- masking
def test_char_mask_forward_matches_dlp_sample(vals):
    # the public DLP sample: SSN 372819127, N=5 -> *****9127
    out = vals(char_mask(F.col("v"), "*", 5), [("372819127",)])
    assert out == ["*****9127"]


def test_char_mask_reverse_and_full_and_short(vals):
    assert vals(char_mask(F.col("v"), "#", 4, reverse_order=True), [("12345678",)]) == ["1234####"]
    assert vals(char_mask(F.col("v"), "*"), [("abc",)]) == ["***"]  # N unset -> all
    assert vals(char_mask(F.col("v"), "*", 10), [("abc",)]) == ["***"]  # N > len
    assert vals(char_mask(F.col("v"), "*", 2), [(None,)]) == [None]


def test_char_mask_rejects_multichar_mask():
    with pytest.raises(ValueError, match="one character"):
        char_mask(F.col("v"), "**", 2)


# ------------------------------------------------------------- date shift
def test_date_shift_deterministic_bounded_and_context_consistent(spark):
    df = spark.createDataFrame(
        [(1, datetime.date(2020, 6, 15)), (1, datetime.date(2021, 1, 1)),
         (2, datetime.date(2020, 6, 15))],
        "k long, d date",
    )
    out = df.select(
        "k", "d",
        date_shift(F.col("d"), -30, 30, context=F.col("k"), salt="s1").alias("s"),
    ).collect()
    by_k = {}
    for r in out:
        delta = (r.s - r.d).days
        assert -30 <= delta <= 30
        by_k.setdefault(r.k, set()).add(delta)
    # consistency contract: same context -> same shift, regardless of date
    assert len(by_k[1]) == 1
    # two runs agree (determinism)
    again = df.select(date_shift(F.col("d"), -30, 30, context=F.col("k"), salt="s1").alias("s")).collect()
    assert [r.s for r in again] == [r.s for r in out]


def test_date_shift_rejects_inverted_bounds():
    with pytest.raises(ValueError, match="lowerBoundDays"):
        date_shift(F.col("d"), 5, -5)


# ------------------------------------------------------------- bucketing
def test_fixed_size_buckets_edges(vals):
    expr = fixed_size_buckets(F.col("v"), 0, 100, 25)
    out = vals(
        expr,
        [(-1.0,), (0.0,), (24.9,), (25.0,), (99.9,), (100.0,), (250.0,), (None,)],
        "v double",
    )
    assert out == ["<0", "0-25", "0-25", "25-50", "75-100", ">=100", ">=100", None]


def test_fixed_size_buckets_validation():
    with pytest.raises(ValueError, match="bucketSize"):
        fixed_size_buckets(F.col("v"), 0, 10, 0)
    with pytest.raises(ValueError, match="lowerBound"):
        fixed_size_buckets(F.col("v"), 10, 10, 1)


def test_value_buckets_ranges_and_passthrough(vals):
    buckets = [
        {"min": 0, "max": 10, "replacementValue": {"stringValue": "low"}},
        {"min": 10, "max": 100, "replacementValue": {"stringValue": "high"}},
    ]
    out = vals(
        value_buckets(F.col("v"), buckets),
        [(5.0,), (10.0,), (99.0,), (-3.0,), (150.0,)],
        "v double",
    )
    assert out == ["low", "high", "high", "-3.0", "150.0"]


def test_value_buckets_requires_buckets():
    with pytest.raises(ValueError, match="non-empty"):
        value_buckets(F.col("v"), [])


# -------------------------------------------------------------- time part
def test_time_part_components(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2023, 7, 4, 15, 30),)], "ts timestamp"
    )
    row = df.select(
        time_part(F.col("ts"), "YEAR").alias("y"),
        time_part(F.col("ts"), "MONTH").alias("m"),
        time_part(F.col("ts"), "DAY_OF_MONTH").alias("d"),
        time_part(F.col("ts"), "HOUR_OF_DAY").alias("h"),
    ).first()
    assert (row.y, row.m, row.d, row.h) == (2023, 7, 4, 15)


def test_time_part_rejects_unknown():
    with pytest.raises(ValueError, match="partToExtract"):
        time_part(F.col("ts"), "FORTNIGHT")


# ---------------------------------------------------- whole-value dispatch
def test_whole_value_dispatch_redact_replace_hash(spark):
    df = spark.createDataFrame([("alice", 7)], "name string, n long")
    redacted = apply_whole_value_transform(df, "name", {"redactConfig": {}})
    assert redacted.first().name is None
    assert dict(redacted.dtypes)["name"] == "string"  # type preserved

    replaced = apply_whole_value_transform(
        df, "n", {"replaceConfig": {"newValue": {"integerValue": 0}}}
    )
    assert replaced.first().n == 0

    hashed = apply_whole_value_transform(
        df, "name", {"cryptoHashConfig": {}}, root_key=b"k" * 32
    )
    out = hashed.first().name
    # reproduce: HKDF-derived key, HMAC-SHA256, base64url
    import base64
    import hashlib
    import hmac

    from auto_data_tokenize_spark.functions.tokenizer import hkdf_sha256

    key = hkdf_sha256(b"k" * 32, b"adt-crypto-hash", b"cryptoHash:name", 32)
    want = base64.urlsafe_b64encode(
        hmac.new(key, b"alice", hashlib.sha256).digest()
    ).decode()
    assert out == want


def test_whole_value_rejects_infotype_and_unknown(spark):
    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(ValueError, match="freeFormColumn"):
        apply_whole_value_transform(df, "v", {"replaceWithInfoTypeConfig": {}})
    with pytest.raises(ValueError, match="unsupported primitive"):
        apply_whole_value_transform(df, "v", {"snazzyConfig": {}})


# ------------------------------------------------------- free-form actions
def test_free_form_repl_actions():
    text = "mail a@b.com now"
    from auto_data_tokenize_spark.functions.detectors import replace_spans

    mask = free_form_repl({"characterMaskConfig": {"maskingCharacter": "#"}})
    assert replace_spans(text, mask) == "mail ####### now"
    redact = free_form_repl({"redactConfig": {}})
    assert replace_spans(text, redact) == "mail  now"
    repl = free_form_repl({"replaceConfig": {"newValue": {"stringValue": "X"}}})
    assert replace_spans(text, repl) == "mail X now"
    label = free_form_repl({"replaceWithInfoTypeConfig": {}})
    assert replace_spans(text, label) == "mail [EMAIL_ADDRESS] now"


def test_free_form_repl_partial_mask_preserves_tail():
    mask = free_form_repl({"characterMaskConfig": {"numberToMask": 3}})
    from auto_data_tokenize_spark.functions.detectors import replace_spans

    assert replace_spans("mail a@b.com now", mask) == "mail ***.com now"
    with pytest.raises(ValueError, match="unsupported free-form"):
        free_form_repl({"dateShiftConfig": {}})


# --------------------------------------------------- config-driven e2e
def test_config_primitive_parse_and_apply(spark):
    cfg = {
        "transforms": [
            {   # free-form: label findings in place
                "columnId": "$.R.text",
                "freeFormColumn": "true",
                "transform": {"replaceWithInfoTypeConfig": {}},
            },
            {   # whole value: mask the tail
                "columnId": "$.R.phone",
                "transform": {
                    "characterMaskConfig": {
                        "maskingCharacter": "*",
                        "numberToMask": 4,
                        "reverseOrder": True,
                    }
                },
            },
        ]
    }
    specs = parse_encrypt_config(cfg)
    assert specs[0].primitive == {"replaceWithInfoTypeConfig": {}}
    assert specs[1].primitive is not None and not specs[1].free_form
    df = spark.createDataFrame(
        [("call 555-867-5309 ok", "5558675309")], "text string, phone string"
    )
    out = apply_encrypt_config(df, specs).first()
    assert out.text == "call [PHONE_NUMBER] ok"
    assert out.phone == "555867****"


def test_config_rejects_two_oneof_members():
    with pytest.raises(ValueError, match="exactly one"):
        parse_encrypt_config(
            {
                "transforms": [
                    {
                        "columnId": "$.R.v",
                        "transform": {
                            "redactConfig": {},
                            "replaceConfig": {"newValue": {"stringValue": "x"}},
                        },
                    }
                ]
            }
        )


# ------------------------------------------------------------ risk metrics
@pytest.fixture(scope="module")
def people(spark):
    rows = [
        Row(seg="A", nat=1, bal=10),
        Row(seg="A", nat=1, bal=20),
        Row(seg="A", nat=1, bal=10),
        Row(seg="B", nat=1, bal=30),
        Row(seg="B", nat=2, bal=30),
        Row(seg="B", nat=2, bal=40),
    ]
    return spark.createDataFrame(rows)


def test_k_anonymity_classes_and_histogram(people):
    classes = {
        (r.seg, r.nat): r.class_size
        for r in risk.k_anonymity(people, ["seg", "nat"]).collect()
    }
    assert classes == {("A", 1): 3, ("B", 1): 1, ("B", 2): 2}
    hist = {
        r.class_size: (r.num_classes, r.num_records)
        for r in risk.k_anonymity_histogram(people, ["seg", "nat"]).collect()
    }
    assert hist == {3: (1, 3), 1: (1, 1), 2: (1, 2)}


def test_l_diversity_distinct_sensitive(people):
    out = {
        (r.seg, r.nat): (r.class_size, r.distinct_sensitive)
        for r in risk.l_diversity(people, ["seg", "nat"], "bal").collect()
    }
    assert out == {("A", 1): (3, 2), ("B", 1): (1, 1), ("B", 2): (2, 2)}
    hist = {
        r.distinct_sensitive: r.num_classes
        for r in risk.l_diversity_histogram(people, ["seg", "nat"], "bal").collect()
    }
    assert hist == {2: 2, 1: 1}


def test_k_map_against_population(spark, people):
    """Released subset = bal >= 20; population = all people. Each
    released class's k is the POPULATION class size; a tuple absent
    from the population reports k_map=0."""
    released = people.where("bal >= 20")
    out = {
        (r.seg, r.nat): (r.dataset_count, r.k_map)
        for r in risk.k_map(released, ["seg", "nat"], people).collect()
    }
    assert out == {("A", 1): (1, 3), ("B", 1): (1, 1), ("B", 2): (2, 2)}
    hist = {
        r.k_map: (r.num_classes, r.num_records)
        for r in risk.k_map_histogram(released, ["seg", "nat"], people).collect()
    }
    assert hist == {3: (1, 1), 1: (1, 1), 2: (1, 2)}
    # tuple missing from the population → k_map 0, never a join drop
    stranger = spark.createDataFrame([Row(seg="Z", nat=9, bal=99)])
    out2 = {
        (r.seg, r.nat): r.k_map
        for r in risk.k_map(
            released.unionByName(stranger), ["seg", "nat"], people
        ).collect()
    }
    assert out2[("Z", 9)] == 0


def test_delta_presence_per_population_class(people):
    released = people.where("bal >= 20")
    out = {
        (r.seg, r.nat): (r.dataset_count, r.population_count, round(r.delta, 6))
        for r in risk.delta_presence(released, ["seg", "nat"], people).collect()
    }
    assert out == {
        ("A", 1): (1, 3, round(1 / 3, 6)),
        ("B", 1): (1, 1, 1.0),
        ("B", 2): (2, 2, 1.0),
    }
    hist = {
        (r.bucket_low, r.bucket_high): (r.num_classes, r.num_population_records)
        for r in risk.delta_presence_histogram(
            released, ["seg", "nat"], people, bucket_edges=[0.0, 0.5, 1.0]
        ).collect()
    }
    # delta=1/3 lands in [0, .5); the two delta=1.0 classes in the
    # final CLOSED bucket [.5, 1.0]
    assert hist == {(0.0, 0.5): (1, 3), (0.5, 1.0): (2, 3)}


def test_delta_presence_histogram_validates_edges(people):
    with pytest.raises(ValueError, match="strictly increasing"):
        risk.delta_presence_histogram(
            people, ["seg"], people, bucket_edges=[0.0, 0.5, 0.5]
        )


def test_categorical_stats_histogram(people):
    hist = {
        r.value_frequency: (r.num_values, r.num_records)
        for r in risk.categorical_stats_histogram(people, "bal").collect()
    }
    # bal values: 10 x2, 20 x1, 30 x2, 40 x1
    assert hist == {2: (2, 4), 1: (2, 2)}


def test_numerical_stats_quantiles(people):
    row = risk.numerical_stats(people, "bal").collect()[0]
    # bal sorted: [10, 10, 20, 30, 30, 40]; linear interpolation
    assert (row.min_value, row.max_value) == (10.0, 40.0)
    assert (row.q_25, row.q_50, row.q_75) == (12.5, 25.0, 30.0)
    with pytest.raises(ValueError, match="within"):
        risk.numerical_stats(people, "bal", quantiles=[1.5])


def test_k_anonymity_monitor_batch_windows(spark):
    """Batch semantics of the windowed monitor: per-hour class-size
    histograms over the QI tuple (the streaming path shares this exact
    plan; q70 exercises it end-to-end through the sink)."""
    rows = [
        ("a", 1, datetime.datetime(2026, 1, 1, 10, 5)),
        ("a", 1, datetime.datetime(2026, 1, 1, 10, 25)),
        ("b", 2, datetime.datetime(2026, 1, 1, 10, 45)),
        ("a", 1, datetime.datetime(2026, 1, 1, 11, 5)),
    ]
    df = spark.createDataFrame(rows, "seg string, nat int, ts timestamp")
    out = {
        (r.window_start.hour, r.class_size): (r.num_classes, r.num_records)
        for r in risk.k_anonymity_monitor(df, ["seg", "nat"]).collect()
    }
    # hour 10: class (a,1) size 2, class (b,2) size 1; hour 11: (a,1) size 1
    assert out == {(10, 2): (1, 2), (10, 1): (1, 1), (11, 1): (1, 1)}


def test_risk_validates_columns(people):
    with pytest.raises(ValueError, match="not in DataFrame"):
        risk.k_anonymity(people, ["nope"])
    with pytest.raises(ValueError, match="non-empty"):
        risk.k_anonymity(people, [])


def test_whole_value_plan_is_jvm_only(spark):
    """100 TB contract: every non-cryptoHash primitive transform stays
    a pure-codegen projection — no Python stage, no shuffle."""
    df = spark.createDataFrame(
        [(1, "abcdef", 42.0, datetime.date(2020, 1, 1))],
        "k long, s string, x double, d date",
    )
    out = apply_whole_value_transform(df, "s", {"characterMaskConfig": {"numberToMask": 2}})
    out = apply_whole_value_transform(out, "x", {
        "fixedSizeBucketingConfig": {"lowerBound": 0, "upperBound": 100, "bucketSize": 10}
    })
    out = apply_whole_value_transform(out, "d", {
        "dateShiftConfig": {"lowerBoundDays": -10, "upperBoundDays": 10,
                            "context": {"name": "k"}}
    }, root_key=b"k" * 32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "Exchange"):
        assert marker not in plan


# ------------------------------------------------- review-fix regressions
def test_k_map_and_delta_presence_null_safe_join(spark):
    """Suppressed (NULL) quasi-identifiers must match across the
    dataset/population join — a plain equi-join would report every
    NULL-bearing class as absent (k_map=0 / delta=0)."""
    pop = spark.createDataFrame(
        [(None, 1)] * 4 + [("A", 1)] * 2, "seg string, nat int"
    )
    ds = spark.createDataFrame([(None, 1)] * 2, "seg string, nat int")
    km = risk.k_map(ds, ["seg", "nat"], pop).collect()
    assert len(km) == 1 and km[0].k_map == 4 and km[0].dataset_count == 2
    dp = {
        r.seg: (r.dataset_count, r.population_count)
        for r in risk.delta_presence(ds, ["seg", "nat"], pop).collect()
    }
    assert dp[None] == (2, 4)
    assert dp["A"] == (0, 2)


def test_delta_presence_histogram_overflow_bucket(spark):
    """delta > 1 (several released records per population individual)
    lands in the explicit NULL/NULL overflow bucket, never dropped."""
    pop = spark.createDataFrame([("A", 1)], "seg string, nat int")
    ds = spark.createDataFrame([("A", 1)] * 3, "seg string, nat int")
    hist = risk.delta_presence_histogram(ds, ["seg", "nat"], pop).collect()
    assert len(hist) == 1
    r = hist[0]
    assert (r.bucket_low, r.bucket_high, r.num_classes) == (None, None, 1)


def test_value_buckets_missing_replacement_raises(spark):
    df = spark.createDataFrame([(5.0,)], "x double")
    with pytest.raises(ValueError, match="replacementValue"):
        df.select(value_buckets(F.col("x"), [{"min": 0, "max": 10}]))


def test_replace_config_missing_new_value_raises(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(ValueError, match="newValue"):
        apply_whole_value_transform(df, "s", {"replaceConfig": {}})


def test_fixed_size_buckets_large_nonintegral_edges(spark):
    """Labels above 1e7 with fractional edges must stay in plain
    decimal notation (driver-side formatting), matching the boundary
    labels — not Java scientific notation."""
    df = spark.createDataFrame([(12_000_000.0,)], "x double")
    out = df.select(
        fixed_size_buckets(F.col("x"), 0.0, 20_000_000.0, 2_500_000.5).alias("b")
    ).collect()[0].b
    assert "E" not in out and out == "10000002-12500002.5"


def test_date_shift_null_context_shifts_instead_of_nulling(spark):
    """A NULL context value must hash as '' (the FPE tweak posture)
    and still shift deterministically (regression: null-propagating
    concat made date_add return NULL, silently erasing the date)."""
    df = spark.createDataFrame(
        [(None, datetime.date(2020, 6, 15)),
         (None, datetime.date(2021, 1, 1)),
         ("u1", datetime.date(2020, 6, 15))],
        "k string, d date",
    )
    out = df.select(
        "k", "d",
        date_shift(F.col("d"), -30, 30, context=F.col("k"), salt="s1").alias("s"),
    ).collect()
    deltas = {}
    for r in out:
        assert r.s is not None
        delta = (r.s - r.d).days
        assert -30 <= delta <= 30
        deltas.setdefault(r.k, set()).add(delta)
    assert len(deltas[None]) == 1  # consistency holds for NULL context


def test_free_form_replace_requires_new_value():
    with pytest.raises(ValueError, match="newValue"):
        free_form_repl({"replaceConfig": {}})


def test_fixed_size_buckets_10k_buckets_is_flat(spark):
    """The permitted 10,000-bucket maximum must analyze and execute —
    a nested per-bucket when().otherwise() tree stack-overflowed
    Catalyst far below the cap; the chain is now ONE flat CaseWhen."""
    expr = fixed_size_buckets(F.col("v"), 0.0, 100000.0, 10.0)
    df = spark.createDataFrame(
        [(5.0,), (99995.0,), (-1.0,), (100000.0,)], "v double"
    )
    got = [r[0] for r in df.select(expr).collect()]
    assert got == ["0-10", "99990-100000", "<0", ">=100000"]
