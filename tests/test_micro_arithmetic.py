"""Property tests (hypothesis) for the round-5 exact-arithmetic
disciplines: the half-up integer division identity, the power-of-two
EWMA fold, the LSH S-curve fixed-point, and the Gini rank formula.
These pin the MATH the cross-engine parity relies on, independent of
any engine."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def half_up_div(a: int, b: int) -> int:
    """The engine's `(2a + b) div (2b)` pattern (a ≥ 0, b > 0)."""
    return (2 * a + b) // (2 * b)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=10**15), st.integers(1, 10**9))
def test_half_up_div_is_exact_round_half_up(a, b):
    """(2a+b) div (2b) == round-half-up(a/b) exactly (no float)."""
    q = Fraction(a, b)
    expected = int(q) + (1 if q - int(q) >= Fraction(1, 2) else 0)
    assert half_up_div(a, b) == expected


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=8))
def test_ewma_powers_of_two_fold_matches_rational(window):
    """The ts_ewma_daily integer formula (weights 2^i, half-up micro
    division) equals the exact rational EWMA for alpha=1/2 over the
    same window."""
    num = sum(c << i for i, c in enumerate(window))
    den = (1 << len(window)) - 1
    got = (2 * 1_000_000 * num + den) // (2 * den)
    exact = Fraction(1_000_000 * num, den)
    expected = int(exact) + (1 if exact - int(exact) >= Fraction(1, 2) else 0)
    assert got == expected
    # convexity: result lies within the scaled window envelope
    assert min(window) * 1_000_000 <= got <= max(window) * 1_000_000


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 19))
def test_lsh_scurve_fixed_point_tracks_float_formula(k):
    """The pure-BIGINT S-curve (r=2, b=4) stays within 3 micro of the
    float formula 1-(1-s^2)^4 — each of the three half-up squarings
    contributes at most half a micro of quantization."""
    s_micro = 50_000 * k

    def sq(x):
        return (2 * x * x + 1_000_000) // 2_000_000

    p_band = sq(s_micro)
    p_cand = 1_000_000 - sq(sq(1_000_000 - p_band))
    s = s_micro / 1e6
    f = 1 - (1 - s * s) ** 4
    assert abs(p_cand - round(f * 1e6)) <= 3
    # monotone in s by construction
    if k > 1:
        prev = 50_000 * (k - 1)
        prev_cand = 1_000_000 - sq(sq(1_000_000 - sq(prev)))
        assert p_cand >= prev_cand


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(1, 1000), min_size=2, max_size=50))
def test_gini_rank_formula_matches_rational(xs):
    """The skew_gini_coefficient BIGINT formula equals the exact
    rational Gini (sorted-rank form), and tie order never changes it."""
    xs_sorted = sorted(xs)
    n = len(xs_sorted)
    sx = sum(xs_sorted)
    six = sum((i + 1) * x for i, x in enumerate(xs_sorted))
    num = 2 * six - (n + 1) * sx
    den = n * sx
    got = (2 * 1_000_000 * num + den) // (2 * den)
    exact = Fraction(1_000_000 * num, den)
    expected = int(exact) + (1 if exact - int(exact) >= Fraction(1, 2) else 0)
    assert got == expected
    assert 0 <= got < 1_000_000
    # tie-break independence: reversing equal runs changes nothing
    import itertools

    regrouped = list(
        itertools.chain.from_iterable(
            sorted(g, reverse=True)
            for _, g in itertools.groupby(xs_sorted)
        )
    )
    six2 = sum((i + 1) * x for i, x in enumerate(regrouped))
    assert six2 == six


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 10**4), min_size=1, max_size=30),
    st.integers(1, 10**6),
)
def test_cms_style_min_never_underestimates(counts, extra):
    """Count-Min's structural guarantee in miniature: for any bucket
    assignment, an item's min-over-rows estimate ≥ its true count."""
    true = counts[0]
    # each "row" sees the true count plus arbitrary collision mass
    row_estimates = [true + (extra % (i + 7)) for i in range(3)]
    assert min(row_estimates) >= true
