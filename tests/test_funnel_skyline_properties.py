"""Property tests for the round-7 operators' semantic claims.

Two docstring claims are load-bearing and worth proving beyond the
SQL oracles (which share *some* structure with the implementations):

1. seq_window_funnel: "greedy earliest-match is provably equivalent to
   'exists an ordered chain'". The implementation computes the greedy
   chain (min signup, then min click strictly after, then min purchase
   strictly after); the SEMANTICS users expect is reachability — does
   ANY strictly-increasing (signup, click, purchase) subsequence
   exist? These must agree on funnel DEPTH for every event history.

2. window_skyline_pareto: the sort-based window rewrite (survive iff
   size strictly exceeds the running max over strictly-cheaper points
   AND carries the price-tie max) must select EXACTLY the classic
   dominance-based skyline, duplicates included.

Both properties are checked pure-Python under hypothesis — no Spark
session, so the space is explored densely (the driver oracle then
pins the Spark plans to the same semantics on the real tables).
"""

from __future__ import annotations

from itertools import product

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# funnel: greedy fold == exists-ordered-chain
# ---------------------------------------------------------------------------

_STEPS = ("signup", "click", "purchase")


def _greedy_depth(events: list[tuple[int, str]]) -> int:
    """The implementation's semantics: chained earliest-after-previous
    minima (identical to the stream_window_funnel fold)."""
    t1 = min((t for t, e in events if e == "signup"), default=None)
    if t1 is None:
        return 0
    t2 = min(
        (t for t, e in events if e == "click" and t > t1), default=None
    )
    if t2 is None:
        return 1
    t3 = min(
        (t for t, e in events if e == "purchase" and t > t2), default=None
    )
    return 2 if t3 is None else 3


def _exists_depth(events: list[tuple[int, str]]) -> int:
    """Reference semantics: the deepest k such that some strictly
    time-increasing subsequence matches the first k steps (brute
    force over all step-event assignments)."""
    best = 0
    for k in range(1, 4):
        steps = _STEPS[:k]
        pools = [
            [t for t, e in events if e == s] for s in steps
        ]
        for combo in product(*pools):
            if all(combo[i] < combo[i + 1] for i in range(k - 1)):
                best = k
                break
    return best


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.sampled_from(_STEPS + ("view", "error")),
        ),
        max_size=10,
    )
)
def test_funnel_greedy_equals_exists(events):
    assert _greedy_depth(events) == _exists_depth(events)


# ---------------------------------------------------------------------------
# skyline: window rewrite == quadratic dominance
# ---------------------------------------------------------------------------


def _dominated(q, pts):
    return any(
        p[0] <= q[0] and p[1] >= q[1] and (p[0] < q[0] or p[1] > q[1])
        for p in pts
    )


def _skyline_quadratic(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    return sorted(q for q in pts if not _dominated(q, pts))


def _skyline_window(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """The implementation's rewrite: running max size over strictly
    cheaper points + price-tie group max (mirrors the two window
    frames in window_skyline_pareto)."""
    out = []
    for price, size in pts:
        m_cheaper = max(
            (s for p, s in pts if p < price), default=None
        )
        m_tie = max(s for p, s in pts if p == price)
        if (m_cheaper is None or size > m_cheaper) and size == m_tie:
            out.append((price, size))
    return sorted(out)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        max_size=12,
    )
)
def test_skyline_window_rewrite_equals_dominance(pts):
    assert _skyline_window(pts) == _skyline_quadratic(pts)


# ---------------------------------------------------------------------------
# MAD: the doubled-integer order-statistic median formula
# ---------------------------------------------------------------------------


def _med2x_formula(vals: list[int]) -> int:
    """Mirror of ts_mad_robust_anomalies' rank formula: the sum of the
    order statistics at ranks (n+1)//2 and (n+2)//2 (the same row
    twice when n is odd)."""
    s = sorted(vals)
    n = len(s)
    return s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1))
def test_med2x_is_twice_the_median(vals):
    import statistics

    med = statistics.median(vals)
    assert _med2x_formula(vals) == int(2 * med)
