"""Unit tests for the insight wave: Markov transitions, Benford audit,
per-key EMA, degree histogram, PMI collocations — each against a tiny
hand-checkable or pure-Python reference."""

import math

import pytest
from pyspark.sql import functions as F

from door2door_etl_spark.operators.graph import degree_histogram
from door2door_etl_spark.operators.profile import benford_digit_audit
from door2door_etl_spark.operators.relational import ema_by_key, markov_transitions
from door2door_etl_spark.operators.text import pmi_collocations


def test_markov_transitions_counts_and_probs(spark):
    rows = [
        # user 1: a -> b -> a -> c   (transitions: ab, ba, ac)
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
        # user 2: a -> b             (transition: ab)
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "seq", "state"])
    out = markov_transitions(df, ["user_id"], ["seq"], "state")
    got = {(r.prev_state, r.next_state): (r.n_transitions, r.prob) for r in out.collect()}
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_markov_transitions_singleton_key_emits_nothing(spark):
    df = spark.createDataFrame([(1, 1, "a")], ["user_id", "seq", "state"])
    assert markov_transitions(df, ["user_id"], ["seq"], "state").count() == 0


def test_benford_digit_audit_reference(spark):
    # 9.996 and 99.996 pin the truncation semantics: a scale-2 rounded
    # rendering would print "10.00"/"100.00" and miscount them as digit
    # 1; their true leading digit is 9
    vals = [1.5, 12.0, 19.9, 2.0, 29.0, 31.4, 900.0, 9.996, 99.996, 0.5, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r.digit: r for r in benford_digit_audit(df, "v").collect()}
    # 0.5 and None excluded -> 9 values: digit 1 x3, 2 x2, 3 x1, 9 x3
    assert sorted(out) == [1, 2, 3, 9]
    assert out[1].n_values == 3 and out[2].n_values == 2
    assert out[9].n_values == 3
    assert out[1].obs_share == round(3 / 9, 6)
    assert out[1].benford_share == round(math.log10(2.0), 6)
    exp = math.log10(1 + 1 / 9)
    chi = 9 * (3 / 9 - exp) ** 2 / exp
    assert out[9].chi2_part == round(chi, 6)


def test_ema_by_key_matches_sequential_fold(spark):
    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
    rows += [(2, 0, 5.0)]
    df = spark.createDataFrame(rows, ["k", "seq", "v"])
    out = {r.k: (r.n_points, r.ema) for r in ema_by_key(df, ["k"], ["seq"], "v", alpha=0.3).collect()}
    ema = 10.0
    for v in [20.0, 30.0, 40.0]:
        ema = v * 0.3 + ema * 0.7
    assert out[1] == (4, round(ema, 6))
    assert out[2] == (1, 5.0)


def test_ema_by_key_order_is_by_order_cols_not_arrival(spark):
    # shuffled input must fold in seq order
    df = spark.createDataFrame([(1, 2, 3.0), (1, 0, 1.0), (1, 1, 2.0)], ["k", "seq", "v"])
    (row,) = ema_by_key(df, ["k"], ["seq"], "v", alpha=0.5).collect()
    # fold: 1.0 -> 2*0.5+1*0.5=1.5 -> 3*0.5+1.5*0.5=2.25
    assert row.ema == 2.25


def test_degree_histogram_triangle_plus_pendant(spark):
    # triangle 1-2-3 plus pendant 3-4: degrees 2,2,3,1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"]
    )
    out = {r.degree: (r.n_nodes, r.node_share) for r in degree_histogram(edges).collect()}
    assert out == {1: (1, 0.25), 2: (2, 0.5), 3: (1, 0.25)}


def test_pmi_collocations_reference(spark):
    # "x y" always adjacent (strong collocation); "a"/"b" independent filler
    docs = [("x y a b",)] * 6 + [("a b b a",)] * 2
    df = spark.createDataFrame(docs, ["text"])
    out = pmi_collocations(df, min_count=2, topk=5).collect()
    # pure-python reference
    toks = [d[0].split() for d in docs]
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    for t in toks:
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for i in range(len(t) - 1):
            bi[(t[i], t[i + 1])] = bi.get((t[i], t[i + 1]), 0) + 1
    nu = sum(uni.values())
    nb = sum(bi.values())
    def pmi(p):
        return round(math.log(bi[p] * nu * nu / (nb * uni[p[0]] * uni[p[1]])), 6)
    got = {(r.w1, r.w2): (r.n_pair, r.pmi) for r in out}
    for p, (n, v) in got.items():
        assert bi[p] == n and pmi(p) == v
    # the planted collocation must rank first
    assert out[0].w1 == "x" and out[0].w2 == "y"


def test_pmi_min_count_prunes_rare_pairs(spark):
    df = spark.createDataFrame([("q r",), ("s t",), ("q r",)], ["text"])
    out = pmi_collocations(df, min_count=2, topk=10).collect()
    assert [(r.w1, r.w2) for r in out] == [("q", "r")]


def test_cusum_drift_detects_level_shift(spark):
    from door2door_etl_spark.operators.profile import cusum_drift

    rows = [("a", i, 0.0) for i in range(10)] + [("a", 10 + i, 5.0) for i in range(10)]
    rows += [("b", i, 3.0) for i in range(5)]  # flat series -> zero excursion
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    out = {r.k: r for r in cusum_drift(df, ["k"], ["seq"], "v").collect()}
    # mean 2.5; first half drifts s down to -25, second half returns to 0
    assert out["a"].mean == 2.5 and out["a"].max_cusum == 25.0
    assert out["b"].max_cusum == 0.0 and out["b"].n_points == 5


def test_cusum_drift_slack_suppresses_noise(spark):
    from door2door_etl_spark.operators.profile import cusum_drift

    # alternating +-1 around the mean: slack 1.0 zeroes every term's excess
    rows = [("a", i, 1.0 if i % 2 else -1.0) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    (row,) = cusum_drift(df, ["k"], ["seq"], "v", slack=1.0).collect()
    assert row.max_cusum == 0.0


def test_bfs_hops_reference(spark):
    from door2door_etl_spark.operators.graph import bfs_hops

    # path 1-2-3-4-5 plus a branch 2-10; node 99-100 unreachable
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (2, 10), (99, 100)], ["src", "dst"]
    )
    out = {r.node: r.hops for r in bfs_hops(edges, source=1, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 10: 2, 4: 3}  # 5 is 4 hops; 99/100 disconnected


def test_bfs_hops_takes_shortest_of_multiple_paths(spark):
    from door2door_etl_spark.operators.graph import bfs_hops

    # 1-2-3 and a shortcut 1-3: node 3 must report hop 1
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    out = {r.node: r.hops for r in bfs_hops(edges, source=1, max_hops=4).collect()}
    assert out == {1: 0, 2: 1, 3: 1}


def test_forward_fill_reference(spark):
    from door2door_etl_spark.operators.relational import forward_fill

    rows = [("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("a", 4, None),
            ("a", 5, 7.0), ("b", 1, None)]
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    out = {(r.k, r.seq): r.f for r in forward_fill(
        df, ["k"], ["seq"], "v", "f").collect()}
    # leading nulls stay null; gaps carry the last observation
    assert out == {("a", 1): None, ("a", 2): 5.0, ("a", 3): 5.0,
                   ("a", 4): 5.0, ("a", 5): 7.0, ("b", 1): None}


def test_time_weighted_avg_reference(spark):
    import datetime as dt

    from door2door_etl_spark.operators.relational import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    # value 10 held for 1s, value 0 held for 3s, final point drops
    rows = [("a", t0, 10.0),
            ("a", t0 + dt.timedelta(seconds=1), 0.0),
            ("a", t0 + dt.timedelta(seconds=4), 99.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    (row,) = time_weighted_avg(df, ["k"], "ts", "v").collect()
    assert row.n_intervals == 2
    assert row.twa == 2.5  # (10*1 + 0*3) / 4


def test_seasonal_hourly_profile_z_scores(spark):
    import datetime as dt

    from door2door_etl_spark.operators.profile import seasonal_hourly_profile

    rows = []
    # type x: hour 0 mean 1.0 (x2), hour 1 mean 1.0, hour 2 mean 4.0 (anomaly)
    for h, vals in [(0, [1.0, 1.0]), (1, [1.0]), (2, [4.0])]:
        for v in vals:
            rows.append(("x", dt.datetime(2024, 1, 1, h, 30), v))
    df = spark.createDataFrame(rows, "t string, ts timestamp, v double")
    out = {r.hour: r for r in seasonal_hourly_profile(
        df, ["t"], "ts", "v").collect()}
    assert out[0].n_values == 2 and out[0].hour_mean == 1.0
    # means are [1, 1, 4]: mu=2, std=sqrt(2); z for hour 2 = 2/sqrt(2)
    assert out[2].z_score == round(2 / (2 ** 0.5), 6)
    assert out[0].z_score == round(-1 / (2 ** 0.5), 6)


def test_heaps_fit_synthetic_power_law(spark):
    """A corpus built with V = N^0.5 exactly (doc i introduces new tokens
    so cumulative vocab tracks sqrt of cumulative tokens) fits slope ~0.5;
    a fully repetitive corpus fits slope ~0."""
    from door2door_etl_spark.operators.text import heaps_fit

    # doc i: ONE new type + 2i filler tokens => after n docs,
    # V = n + 1, N ~ n^2 => ln V ~ 0.5 ln N asymptotically
    docs = []
    for i in range(1, 41):
        words = [f"t{i}"] + ["x"] * (2 * i)
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    (row,) = heaps_fit(df, points=8).collect()
    assert row.n_points >= 5
    assert 0.35 < row.slope < 0.65

    flat = spark.createDataFrame(
        [(i, "a b c a b c") for i in range(1, 31)], "doc_id int, text string"
    )
    (row2,) = heaps_fit(flat, points=8).collect()
    assert abs(row2.slope) < 0.05


def test_concentration_report_reference(spark):
    from door2door_etl_spark.operators.relational import concentration_report

    # segment g: entities with values 1, 1, 2  (monopolized-ish)
    rows = [("g", "a", 1.0), ("g", "b", 1.0), ("g", "c", 2.0),
            ("m", "x", 5.0)]  # single entity: hhi 1, gini 0, top1 1
    df = spark.createDataFrame(rows, "seg string, ent string, v double")
    out = {r.seg: r for r in concentration_report(
        df, ["seg"], ["ent"], "v").collect()}
    g = out["g"]
    assert g.n_entities == 3
    assert g.top1_share == 0.5
    assert g.hhi == round(0.25 ** 2 + 0.25 ** 2 + 0.5 ** 2, 6)
    # sorted values [1,1,2]: gini = 2*(1*1+2*1+3*2)/(3*4) - 4/3 = 1/6
    assert g.gini == round(1 / 6, 6)
    m = out["m"]
    assert (m.n_entities, m.top1_share, m.hhi, m.gini) == (1, 1.0, 1.0, 0.0)


def test_concentration_report_huge_totals_stay_exact(spark):
    """Entity totals past 10^14 must not overflow the rank-weighted
    product's decimal intermediate: the earlier decimal(18,4) cast
    silently NULLed Spark-side (non-ANSI) while DuckDB raised — a
    divergent failure at plausible monetary magnitudes.  decimal(28,4)
    keeps the product exact: for values [1e15, 3e15],
    gini = 2*(1*1 + 2*3)/(2*4) - 3/2 = 1/4."""
    from door2door_etl_spark.operators.relational import concentration_report

    rows = [("g", "a", 1.0e15), ("g", "b", 3.0e15)]
    df = spark.createDataFrame(rows, "seg string, ent string, v double")
    (r,) = concentration_report(df, ["seg"], ["ent"], "v").collect()
    assert r.gini is not None and r.hhi is not None
    assert r.gini == 0.25
    assert r.top1_share == 0.75
    assert r.hhi == round(0.25 ** 2 + 0.75 ** 2, 6)


def test_mad_outliers_robust_to_the_outlier_itself(spark):
    from door2door_etl_spark.operators.profile import mad_outliers

    # 20 values at 10 +- 1, one at 1000: classical sigma is inflated by
    # the outlier; MAD flags it anyway
    rows = [("t", i, 10.0 + (1 if i % 2 else -1)) for i in range(20)]
    rows.append(("t", 99, 1000.0))
    df = spark.createDataFrame(rows, "event_type string, event_id int, value double")
    out = mad_outliers(df, ["event_type"], "value").collect()
    assert [r.event_id for r in out] == [99]
    (r,) = out
    # sorted: ten 9s, ten 11s, 1000 -> median 11; |v-11| -> ten 0s,
    # ten 2s, 989 -> MAD 2; rz = 0.6745*(v-med)/mad is one exact
    # division away from the reported components
    assert (r.med, r.mad) == (11.0, 2.0)
    assert 0.6745 * (r.value - r.med) / r.mad > 3.5


def test_mad_outliers_flat_group_emits_nothing(spark):
    from door2door_etl_spark.operators.profile import mad_outliers

    df = spark.createDataFrame(
        [("t", i, 5.0) for i in range(10)],
        "event_type string, event_id int, value double",
    )
    # MAD = 0 -> robust_z is null/inf-free division guard: no rows flagged
    out = mad_outliers(df, ["event_type"], "value").collect()
    assert out == []


def test_personalized_pagerank_reference(spark):
    """Pure-Python RWR reference on a small weighted digraph, plus the
    PPR invariants: mass sums to 1, and the restart node dominates."""
    from door2door_etl_spark.operators.graph import personalized_pagerank

    edges = [("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 1.0), ("a", "c", 2.0),
             ("d", "a", 1.0)]  # c has an edge back; d feeds in; no dangling
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r.node: r.rank for r in personalized_pagerank(
        df, "a", weight_col="w", iterations=8).collect()}

    # python reference (same fixed iteration count, same update rule)
    nodes = {"a", "b", "c", "d"}
    outw = {"a": 4.0, "b": 1.0, "c": 1.0, "d": 1.0}
    p = {("a", "b"): 0.5, ("b", "c"): 1.0, ("c", "a"): 1.0,
         ("a", "c"): 0.5, ("d", "a"): 1.0}
    d = 0.85
    r = {n: (1.0 if n == "a" else 0.0) for n in nodes}
    for _ in range(8):
        dang = sum(v for n, v in r.items() if n not in outw)
        nxt = {}
        for n in nodes:
            c = sum(r[u] * pw for (u, v), pw in p.items() if v == n)
            nxt[n] = d * c + ((1 - d) + d * dang if n == "a" else 0.0)
        r = nxt
    for n in nodes:
        assert abs(got[n] - r[n]) < 1e-9, (n, got[n], r[n])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["a"] == max(got.values())


def test_funnel_time_bound_gap_enforced(spark):
    import datetime as dt

    from door2door_etl_spark.operators.relational import conversion_funnel

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1 converts fully within the gaps
        (1, "view", t0), (1, "click", t0 + dt.timedelta(seconds=30)),
        (1, "purchase", t0 + dt.timedelta(seconds=50)),
        # user 2's click comes 2h after view: outside a 1h gap
        (2, "view", t0), (2, "click", t0 + dt.timedelta(hours=2)),
        (2, "purchase", t0 + dt.timedelta(hours=2, seconds=10)),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
    steps = ["view", "click", "purchase"]
    bound = {r.step: r.n_users for r in conversion_funnel(
        df, steps, max_gap_seconds=3600).collect()}
    assert bound == {"view": 2, "click": 1, "purchase": 1}
    # unbounded form still credits user 2
    free = {r.step: r.n_users for r in conversion_funnel(df, steps).collect()}
    assert free == {"view": 2, "click": 2, "purchase": 2}


def test_containment_catches_subset_jaccard_misses(spark):
    from door2door_etl_spark.operators.dedup import ngram_jaccard_pairs

    # doc 2's shingles all sit inside doc 1; doc 3 unrelated
    big = "a b c d e f g h i j k l m n o p q r s t"
    small = "a b c d e f g"  # a strict prefix -> all its 3-grams in big
    docs = spark.createDataFrame(
        [(1, big), (2, small), (3, "z y x w v u t1 s1 r1")],
        "doc_id long, text string",
    )
    out = ngram_jaccard_pairs(
        docs, shingle_n=3, max_df=20, with_containment=True
    ).collect()
    pair = {(r.id_a, r.id_b): r for r in out}[(1, 2)]
    assert pair.containment == 1.0          # fully contained
    assert pair.jaccard < 0.5               # symmetric measure under-ranks


def test_holt_forecast_matches_sequential_fold(spark):
    from door2door_etl_spark.operators.relational import holt_forecast

    rows = [(1, i, float(v)) for i, v in enumerate([2, 4, 5, 9, 7])]
    rows += [(2, 0, 5.0)]  # single point: level=v, trend=0
    df = spark.createDataFrame(rows, ["k", "seq", "v"])
    got = {r.k: r for r in holt_forecast(
        df, ["k"], ["seq"], "v", alpha=0.3, beta=0.2, horizon=3
    ).collect()}

    a, bt = 0.3, 0.2
    l, b = 2.0, 0.0
    for v in [4.0, 5.0, 9.0, 7.0]:
        nl = a * v + (1 - a) * (l + b)
        nb = bt * (a * v + (1 - a) * (l + b) - l) + (1 - bt) * b
        l, b = nl, nb
    assert got[1].n_points == 5
    assert got[1].level == round(l, 6)
    assert got[1].trend == round(b, 6)
    assert got[1].forecast == round(l + 3.0 * b, 6)
    assert (got[2].level, got[2].trend, got[2].forecast) == (5.0, 0.0, 5.0)
