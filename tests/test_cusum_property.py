"""Property test for the CUSUM window-unrolling identity.

ts_cusum_changepoint rests on one algebraic fact: the textbook
recursion ``S+_t = max(0, S+_{t-1} + d_t)`` equals
``C_t - min(0, min_{j<=t} C_j)`` with C the running cumsum of d (and
the mirrored identity for S-). The Spark/DuckDB sides both compute the
unrolled form, so the oracle gate can never see a bug in the unrolling
itself — this test pits the unrolled form against the literal
recursion in plain Python on adversarial integer series (sign flips,
zeros, long monotone runs, empty).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_d = st.lists(
    st.integers(min_value=-(10**12), max_value=10**12), max_size=200
)


@given(ds=_d)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_cusum_unrolling_identity(ds):
    # literal recursions
    s_pos_rec, s_neg_rec, sp, sn = [], [], 0, 0
    for d in ds:
        sp = max(0, sp + d)
        sn = max(0, sn - d)
        s_pos_rec.append(sp)
        s_neg_rec.append(sn)
    # unrolled window forms (what the Spark plan and the oracle compute)
    c, run_min, run_max = 0, 0, 0
    for i, d in enumerate(ds):
        c += d
        run_min = min(run_min, c)
        run_max = max(run_max, c)
        assert c - run_min == s_pos_rec[i]
        assert run_max - c == s_neg_rec[i]
