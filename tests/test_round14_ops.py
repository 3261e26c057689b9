"""Round-14 additions: brute-force twins for the new query family.

Each test recomputes the query's statistic from the raw sf0.001 parquet
in plain Python (an INDEPENDENT formulation — collected rows, dicts and
math.*, no Spark expressions), then compares against the query output.
The DuckDB oracle harness already pins Spark == SQL-twin; these pin
Spark == the textbook definition.
"""

import math

import duckdb
import pytest

from dawis_spark import queries as q

_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("orders", "documents", "lineitem", "customer", "supplier",
              "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" parquet_scan('{_SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _orders_cents(duck):
    return duck.execute(
        "SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT),"
        " o_orderpriority, o_custkey FROM orders"
    ).fetchall()


def _daily_rev(duck):
    return [
        r[0]
        for r in duck.execute(
            "SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) FROM orders GROUP BY o_orderdate ORDER BY o_orderdate"
        ).fetchall()
    ]


def test_jonckheere_terpstra_matches_brute_force(spark, duck):
    rows = _orders_cents(duck)
    groups = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    by_g = {g: sorted(v for v, gg, _ in rows if gg == g) for g in groups}
    jt2 = 0
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            a, b = by_g[groups[i]], by_g[groups[j]]
            for x in b:
                # 2 * #{a < x} + #{a == x}
                import bisect

                lo = bisect.bisect_left(a, x)
                hi = bisect.bisect_right(a, x)
                jt2 += 2 * lo + (hi - lo)
    out = q.QUERIES["jonckheere_terpstra_priority"](spark, _SF).collect()[0]
    assert out["n_rows"] == len(rows)
    assert out["jt_stat"] == round(jt2 / 2, 1)
    # null moments against the textbook formulas
    ns = [len(by_g[g]) for g in groups]
    nn = sum(ns)
    mu = (nn * nn - sum(n * n for n in ns)) / 4
    assert abs(out["mean_null"] - mu) < 0.5e-4 + 1e-9 * abs(mu)
    from collections import Counter

    ties = Counter(v for v, _, _ in rows)
    ts = list(ties.values())
    a_term = (
        nn * (nn - 1) * (2 * nn + 5)
        - sum(n * (n - 1) * (2 * n + 5) for n in ns)
        - sum(t * (t - 1) * (2 * t + 5) for t in ts)
    )
    b_term = sum(n * (n - 1) * (n - 2) for n in ns) * sum(
        t * (t - 1) * (t - 2) for t in ts
    )
    c_term = sum(n * (n - 1) for n in ns) * sum(t * (t - 1) for t in ts)
    var = (
        a_term / 72
        + b_term / (36 * nn * (nn - 1) * (nn - 2))
        + c_term / (8 * nn * (nn - 1))
    )
    z = (jt2 / 2 - mu) / math.sqrt(var)
    assert abs(out["z_score"] - z) < 1e-5
    spark.catalog.clearCache()


def test_hill_tail_index_matches_brute_force(spark, duck):
    vals = sorted((v for v, _, _ in _orders_cents(duck)), reverse=True)
    k = 100
    thr = vals[k]
    s = sum(math.log(v) for v in sorted(vals[:k])) - k * math.log(thr)
    out = q.QUERIES["hill_tail_index"](spark, _SF).collect()[0]
    assert out["k_top"] == k and out["threshold_cents"] == thr
    assert abs(out["hill_alpha"] - k / s) < 1e-5
    spark.catalog.clearCache()


def test_turning_points_matches_brute_force(spark, duck):
    rev = _daily_rev(duck)
    t = sum(
        1
        for i in range(1, len(rev) - 1)
        if (rev[i - 1] < rev[i] > rev[i + 1])
        or (rev[i - 1] > rev[i] < rev[i + 1])
    )
    out = q.QUERIES["turning_points_test"](spark, _SF).collect()[0]
    assert out["n_days"] == len(rev) and out["n_turning"] == t
    n = len(rev)
    z = (t - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
    assert abs(out["z_score"] - z) < 1e-5
    assert 0.0 <= out["p_value"] <= 1.0
    spark.catalog.clearCache()


def test_adf_unit_root_matches_brute_force(spark, duck):
    rev = _daily_rev(duck)
    xs = rev[:-1]
    ys = [b - a for a, b in zip(rev[:-1], rev[1:])]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = n * sxx - sx * sx
    b = (n * sxy - sx * sy) / den
    a = (sy - b * sx) / n
    ssr = sum((y - a - b * x) ** 2 for x, y in zip(xs, ys))
    se = math.sqrt((ssr / (n - 2)) * n / den)
    out = q.QUERIES["adf_unit_root_daily"](spark, _SF).collect()[0]
    assert out["n_obs"] == n
    assert abs(out["beta"] - b) < 1e-5
    assert abs(out["df_stat"] - b / se) < 1e-4
    spark.catalog.clearCache()


def test_pacf_matches_brute_force_durbin_levinson(spark, duck):
    rev = _daily_rev(duck)
    n = len(rev)
    s = sum(rev)
    sxx = sum(v * v for v in rev)
    rho = {}
    for k in range(1, 7):
        pairs = list(zip(rev[:-k], rev[k:]))
        sxy = sum(a * b for a, b in pairs)
        sh = sum(a for a, _ in pairs)
        st = sum(b for _, b in pairs)
        m = len(pairs)
        rho[k] = (n * n * sxy - n * s * (sh + st) + m * s * s) / (
            n * n * sxx - n * s * s
        )
    phi = {1: {1: rho[1]}}
    for k in range(2, 7):
        num = rho[k] - sum(phi[k - 1][j] * rho[k - j] for j in range(1, k))
        den = 1 - sum(phi[k - 1][j] * rho[j] for j in range(1, k))
        pkk = num / den
        phi[k] = {j: phi[k - 1][j] - pkk * phi[k - 1][k - j] for j in range(1, k)}
        phi[k][k] = pkk
    got = {
        r["lag"]: r["pacf"]
        for r in q.QUERIES["pacf_daily_revenue"](spark, _SF).collect()
    }
    assert set(got) == set(range(1, 7))
    for k in range(1, 7):
        assert abs(got[k] - phi[k][k]) < 1e-5, k
    # AR-identifiability sanity: pacf(1) == acf(1) by definition
    assert abs(got[1] - rho[1]) < 1e-5
    spark.catalog.clearCache()


def test_spectral_entropy_matches_brute_force(spark, duck):
    rev = _daily_rev(duck)
    n = len(rev)
    ps = []
    for k in range(1, 15):
        c6 = [round(math.cos(2 * math.pi * k * t / n) * 1e6) for t in range(n)]
        s6 = [round(math.sin(2 * math.pi * k * t / n) * 1e6) for t in range(n)]
        sc = sum(v * c for v, c in zip(rev, c6))
        ss = sum(v * c for v, c in zip(rev, s6))
        ps.append((sc / 1e8 / n) ** 2 + (ss / 1e8 / n) ** 2)
    ptot = sum(ps)
    h = -sum(p / ptot * math.log(p / ptot) for p in ps) / math.log(14)
    out = q.QUERIES["spectral_entropy_daily"](spark, _SF).collect()[0]
    assert out["n_freqs"] == 14
    assert abs(out["spectral_entropy"] - h) < 1e-4
    assert abs(out["dominant_share"] - max(ps) / ptot) < 1e-5
    assert 0.0 <= out["spectral_entropy"] <= 1.0
    spark.catalog.clearCache()


def _phi_upper(z: float) -> float:
    """P(Z > z) via the same A&S 7.1.26 polynomial the engine uses."""
    az = abs(z) / math.sqrt(2)
    tt = 1 / (1 + 0.3275911 * az)
    p2 = (
        ((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
          - 0.284496736) * tt + 0.254829592) * tt * math.exp(-(az * az))
    )
    return p2 / 2 if z >= 0 else 1 - p2 / 2


def test_tost_matches_brute_force(spark, duck):
    rows = _orders_cents(duck)
    arm0 = [v for v, _, c in rows if c % 2 == 0]
    arm1 = [v for v, _, c in rows if c % 2 == 1]

    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        v = (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)
        return n, m, v

    n0, m0, v0 = mv(arm0)
    n1, m1, v1 = mv(arm1)
    se = math.sqrt(v0 / n0 + v1 / n1)
    diff, marg = m1 - m0, 0.02 * m0
    zl, zu = (diff + marg) / se, (marg - diff) / se
    p = max(_phi_upper(zl), _phi_upper(zu))
    out = q.QUERIES["tost_equivalence_value"](spark, _SF).collect()[0]
    assert (out["n_ctrl"], out["n_treat"]) == (n0, n1)
    assert abs(out["z_lower"] - zl) < 1e-4
    assert abs(out["z_upper"] - zu) < 1e-4
    assert abs(out["p_tost"] - p) < 1e-5
    assert out["equivalent"] == (1 if p < 0.05 else 0)
    spark.catalog.clearCache()


def test_delta_method_matches_brute_force(spark, duck):
    per = duck.execute(
        "SELECT SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)),"
        " COUNT(*) FROM orders GROUP BY o_custkey"
    ).fetchall()
    ys = [r[0] for r in per]
    ns = [r[1] for r in per]
    m = len(per)
    sy, sn = sum(ys), sum(ns)
    r = sy / sn
    vy = (sum(y * y for y in ys) - sy * sy / m) / (m - 1)
    vn = (sum(n * n for n in ns) - sn * sn / m) / (m - 1)
    cv = (sum(y * n for y, n in zip(ys, ns)) - sy * sn / m) / (m - 1)
    se = math.sqrt((vy - 2 * r * cv + r * r * vn) / m) / (sn / m)
    out = q.QUERIES["delta_method_ratio_ci"](spark, _SF).collect()[0]
    assert out["m_customers"] == m
    assert abs(out["ratio_cents"] - r) < 1e-4
    assert abs(out["se_ratio"] - se) < 1e-4
    assert abs(out["ci_lo"] - (r - 1.96 * se)) < 1e-3
    assert abs(out["ci_hi"] - (r + 1.96 * se)) < 1e-3
    spark.catalog.clearCache()


def test_aa_calibration_matches_brute_force(spark, duck):
    rows = _orders_cents(duck)
    zs = []
    for s in range(32):
        a0, a1 = [], []
        for v, _, c in rows:
            hi = ((c % 2147483648) * 2654435761 + s * 40503) % 4294967296
            (a1 if hi >= 2147483648 else a0).append(v)
        n0, n1 = len(a0), len(a1)
        m0, m1 = sum(a0) / n0, sum(a1) / n1
        v0 = (sum(x * x for x in a0) - sum(a0) ** 2 / n0) / (n0 - 1)
        v1 = (sum(x * x for x in a1) - sum(a1) ** 2 / n1) / (n1 - 1)
        zs.append((m1 - m0) / math.sqrt(v0 / n0 + v1 / n1))
    out = q.QUERIES["aa_calibration_fpr"](spark, _SF).collect()[0]
    fp = sum(1 for z in zs if abs(z) > 1.96)
    assert out["k_splits"] == 32 and out["n_false_pos"] == fp
    assert abs(out["fpr"] - fp / 32) < 1e-9
    assert abs(out["max_abs_z"] - max(abs(z) for z in zs)) < 1e-4
    assert abs(out["mean_abs_z"] - sum(abs(z) for z in zs) / 32) < 1e-4
    spark.catalog.clearCache()


def test_truncation_loss_matches_brute_force(spark, duck):
    toks = [
        r[0]
        for r in duck.execute(
            "SELECT len(list_filter(string_split_regex(lower(text), '\\s+'),"
            " t -> t != '')) FROM documents"
        ).fetchall()
    ]
    out = {
        r["context_len"]: r
        for r in q.QUERIES["context_truncation_loss"](spark, _SF).collect()
    }
    assert set(out) == {16, 32, 64, 128, 256}
    total = sum(toks)
    prev_lost = None
    for L in sorted(out):
        lost = sum(t - L for t in toks if t > L)
        trunc = sum(1 for t in toks if t > L)
        row = out[L]
        assert row["n_docs"] == len(toks)
        assert row["tokens_total"] == total
        assert row["tokens_lost"] == lost
        assert row["docs_truncated"] == trunc
        assert abs(row["frac_lost"] - lost / total) < 1e-6
        # monotone: a bigger budget never loses more
        if prev_lost is not None:
            assert lost <= prev_lost
        prev_lost = lost
    spark.catalog.clearCache()


def test_region_modularity_matches_brute_force(spark, duck):
    edges = duck.execute("""
        SELECT rc.r_name, rs.r_name FROM (
          SELECT DISTINCT o_custkey AS c, l_suppkey AS s
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey) p
        JOIN customer ON c = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region rc ON nc.n_regionkey = rc.r_regionkey
        JOIN supplier ON s = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN region rs ON ns.n_regionkey = rs.r_regionkey
    """).fetchall()
    m = len(edges)
    regions = sorted({r for e in edges for r in e})
    qsum = 0.0
    expected = {}
    for r in regions:
        intra = sum(1 for a, b in edges if a == r and b == r)
        deg = sum(1 for a, _ in edges if a == r) + sum(
            1 for _, b in edges if b == r
        )
        contrib = intra / m - (deg / (2 * m)) ** 2
        expected[r] = (intra, deg, contrib)
        qsum += contrib
    out = {
        r["r_name"]: r
        for r in q.QUERIES["region_trade_modularity"](spark, _SF).collect()
    }
    for r, (intra, deg, contrib) in expected.items():
        assert out[r]["intra_edges"] == intra
        assert out[r]["degree_endpoints"] == deg
        assert abs(out[r]["contribution"] - contrib) < 1e-6
        assert abs(out[r]["q_modularity"] - qsum) < 1e-6
    spark.catalog.clearCache()


def test_fairness_gaps_internal_consistency(spark):
    rows = q.QUERIES["classifier_fairness_gaps"](spark, _SF).collect()
    assert rows
    tprs = [r["tpr"] for r in rows if r["tpr"] is not None]
    fprs = [r["fpr"] for r in rows if r["fpr"] is not None]
    sels = [r["selection_rate"] for r in rows]
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n_docs"]
        for c in ("tpr", "fpr", "selection_rate"):
            if r[c] is not None:
                assert 0.0 <= r[c] <= 1.0
        # gap columns are constant across rows
        assert r["tpr_gap"] == rows[0]["tpr_gap"]
    assert abs(rows[0]["tpr_gap"] - (max(tprs) - min(tprs))) < 1e-5
    assert abs(rows[0]["fpr_gap"] - (max(fprs) - min(fprs))) < 1e-5
    assert abs(rows[0]["selection_gap"] - (max(sels) - min(sels))) < 1e-5
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# Plan-shape pins (the scale claims above, checked against the actual
# physical plans — the test_plan_properties discipline)
# ---------------------------------------------------------------------------


def _plan(spark, name):
    from dawis_spark.catalog import register_testdata

    register_testdata(spark, _SF)
    df = q.QUERIES[name](spark, _SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_jt_plan_has_no_partitionless_window_or_cartesian(spark):
    """The JT walk rides value_cum_walk's two-level prefix sum: every
    Window node is PARTITIONED by the range bucket (the r12 distinct-
    cents retirement — no single-task sort), and there is no cartesian
    product (the 10 pair terms are closed expressions, not a group
    self-join)."""
    from tests.test_plan_properties import _partitionless_windows

    plan = _plan(spark, "jonckheere_terpstra_priority")
    assert _partitionless_windows(plan) == []
    assert "Window [" in plan  # the bucket-partitioned cumsum is there
    assert "CartesianProduct" not in plan
    spark.catalog.clearCache()


def test_hill_plan_is_takeordered(spark):
    """TakeOrdered (per-partition heap + k-row merge), not a global
    sort, feeds the top-(k+1) relation."""
    plan = _plan(spark, "hill_tail_index")
    assert "TakeOrderedAndProject" in plan
    spark.catalog.clearCache()


def test_aa_calibration_expands_the_customer_aggregate(spark):
    """The x32 split grid joins AFTER the per-customer moment
    aggregate: orders parquet is scanned ONCE, and the grid join is the
    broadcast nested loop over the 32-row literal range (SCALE.md r14:
    11.1 -> 1.2 s at sf1 from exactly this shape)."""
    plan = _plan(spark, "aa_calibration_fpr")
    assert plan.count("orders.parquet") == 1
    assert "BroadcastNestedLoopJoin" in plan
    spark.catalog.clearCache()


def test_modularity_dims_broadcast(spark):
    """nation/region sides and the 5-row region grid reach the edge
    relation as broadcasts — no sort-merge exchange against a 5-row
    dimension."""
    plan = _plan(spark, "region_trade_modularity")
    assert "BroadcastHashJoin" in plan
    assert "region.parquet" in plan
    spark.catalog.clearCache()


def test_srm_cumulative_watch_equals_streaming_closed_form(spark, duck):
    """The batch twin discipline for detector #7: the query's running
    (cum_n_a, cum_n_b, chi2, flag) walk must equal srm_closed_form —
    the SAME function the streaming monitor replays per micro-batch —
    over the query's own daily rollups, row for row."""
    from dawis_spark.streaming.srmmon import srm_closed_form

    rows = q.QUERIES["srm_cumulative_watch"](spark, _SF).collect()
    daily = duck.execute("""
        WITH enroll AS (
          SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
                 MIN(date_trunc('day', ts)) AS day
          FROM parquet_scan('/root/testdata/sf0.001/events.parquet')
          GROUP BY user_id, arm)
        SELECT day,
               SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END),
               SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
        FROM enroll GROUP BY day ORDER BY day
    """).fetchall()
    series = [(i, (int(a), int(b))) for i, (_, a, b) in enumerate(daily)]
    walk = srm_closed_form(series, min_n=100)
    assert len(rows) == len(walk)
    for r, (_, na, nb, chi2m, flag) in zip(rows, walk):
        assert (r["cum_n_a"], r["cum_n_b"]) == (na, nb)
        assert abs(r["chi2"] * 1000 - chi2m) <= 0.501  # milli-rounding
        assert r["srm_flag"] == flag
    spark.catalog.clearCache()
