"""Property test for the streaming funnel fold + watermark eviction
(round 9): _funnel_step driven directly (no Spark) with a fake
GroupState over randomized event streams, micro-batch partitions, and
a lagging watermark schedule.

Claims pinned, per the eviction proof in the _funnel_step docstring:

1. **Replay equivalence**: for ANY disorder-bounded arrival order and
   ANY micro-batch partitioning, the final frontier equals the batch
   fold over all events (t1 = min signup, t2 = min click > t1,
   t3 = min purchase > t2, depth, 7-day conversion flag).
2. **State bound**: after every batch, the surviving candidate sets
   hold only the current picks plus candidates strictly newer than
   the watermark — never the full history.
3. **Timeout safety**: when the watermark passes a signup-less user's
   newest candidate (simulated timeout), removing the state never
   changes the final answer.

The watermark schedule mirrors Spark's: wm_k = max event time seen in
batches < k minus the delay; events are generated with disorder
bounded by the delay so none is late (a late event would lawfully be
dropped by the engine, putting the batch fold out of reach on both
engines equally — not the property under test).
"""

from __future__ import annotations

import random

import pandas as pd

from hive_service_spark.streaming.events import _funnel_step

_DELAY_US = 60_000_000  # watermark delay: 60s of real disorder
_WINDOW_US = 7 * 24 * 3600 * 1_000_000


class FakeGroupState:
    """The GroupState surface _funnel_step touches, driven manually."""

    def __init__(self):
        self._value = None
        self._wm_ms = 0
        self._timeout_ms = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        if self._value is None:
            raise ValueError("state does not exist")
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None

    def getCurrentWatermarkMs(self):
        return self._wm_ms

    def setTimeoutTimestamp(self, ts_ms):
        self._timeout_ms = ts_ms


def _batch_answer(events):
    """The batch fold (seq_window_funnel semantics) over all events."""
    signups = [t for et, t in events if et == "signup"]
    t1 = min(signups) if signups else -1
    t2 = (
        min((t for et, t in events if et == "click" and t > t1), default=-1)
        if t1 >= 0
        else -1
    )
    t3 = (
        min(
            (t for et, t in events if et == "purchase" and t > t2),
            default=-1,
        )
        if t2 >= 0
        else -1
    )
    depth = 0 if t1 < 0 else 1 if t2 < 0 else 2 if t3 < 0 else 3
    conv = 1 if t3 >= 0 and t3 - t1 <= _WINDOW_US else 0
    return (t1, t2, t3, depth, conv)


def _drive(events_in_arrival_order, batch_sizes, fire_timeouts):
    """Feed batches through _funnel_step with a Spark-like watermark
    schedule; returns (last emission tuple, per-batch state sizes)."""
    state = FakeGroupState()
    wm = 0
    last = None
    sizes = []
    i = 0
    seen_max = 0
    for n in batch_sizes:
        batch = events_in_arrival_order[i : i + n]
        i += n
        if not batch:
            continue
        state._wm_ms = wm // 1000  # Spark reports watermark in millis
        state.hasTimedOut = False
        pdf = pd.DataFrame(
            {
                "event_type": [et for et, _ in batch],
                "t": [t for _, t in batch],
            }
        )
        out = list(_funnel_step((7,), [pdf], state))
        assert len(out) == 1
        r = out[0].iloc[0]
        last = (
            int(r["t1_us"]),
            int(r["t2_us"]),
            int(r["t3_us"]),
            int(r["depth"]),
            int(r["converted_7d"]),
        )
        if state.exists:
            t1, clicks, purchases = state.get
            sizes.append(len(clicks) + len(purchases))
            # claim 2: only picks + candidates newer than the watermark
            if wm > 0:
                t2 = min((c for c in clicks if c > t1), default=-1) if t1 >= 0 else -1
                for c in clicks:
                    assert c > wm or (0 <= t1 < c), (c, wm, t1)
                for p in purchases:
                    assert p > wm or (0 <= t2 < p), (p, wm, t2)
        else:
            sizes.append(0)
        # watermark advances AFTER the batch, like Spark
        seen_max = max([seen_max] + [t for _, t in batch])
        wm = max(wm, seen_max - _DELAY_US + 1)
        # claim 3: simulate the timeout firing when armed and due
        if (
            fire_timeouts
            and state.exists
            and state._timeout_ms is not None
            and state._timeout_ms < wm // 1000
        ):
            state._wm_ms = wm // 1000
            state.hasTimedOut = True
            assert list(_funnel_step((7,), [], state)) == []
            state.hasTimedOut = False
    return last, sizes


def _gen_stream(rnd):
    """Random event stream with arrival disorder bounded by _DELAY."""
    n = rnd.randint(1, 40)
    base = 1_700_000_000_000_000
    events = []
    for _ in range(n):
        et = rnd.choice(["signup", "click", "purchase", "view"])
        t = base + rnd.randint(0, 50) * 20_000_000  # 20s grid, ties likely
        # (60s disorder bound spans ~3 grid steps, so clicks/purchases
        # genuinely arrive before their signups across batches)
        events.append((et, t))
    # arrival order: event-time order perturbed within the delay bound
    arrival = sorted(events, key=lambda e: e[1] + rnd.randint(0, _DELAY_US - 1))
    return arrival


def test_funnel_replay_equivalence_and_state_bound():
    rnd = random.Random(909)
    for case in range(400):
        arrival = _gen_stream(rnd)
        funnel_events = [e for e in arrival if e[0] != "view"]
        want = _batch_answer(funnel_events)
        # random batch partition
        sizes = []
        left = len(arrival)
        while left > 0:
            k = rnd.randint(1, max(1, left // 2) if left > 3 else left)
            sizes.append(k)
            left -= k
        got, state_sizes = _drive(
            [e for e in arrival if e[0] != "view"],
            _rescale(sizes, len(funnel_events)),
            fire_timeouts=bool(case % 2),
        )
        if got is None:
            assert want == (-1, -1, -1, 0, 0)
            continue
        assert got == want, (case, got, want)


def _rescale(sizes, total):
    """Clip a batch-size list to sum to `total` (views were dropped)."""
    out = []
    left = total
    for s in sizes:
        if left <= 0:
            break
        k = min(s, left)
        out.append(k)
        left -= k
    if left > 0:
        out.append(left)
    return out


def test_funnel_state_never_holds_history():
    """A pure clicker under ordered arrival with an advancing watermark
    keeps only the disorder horizon, not every click (the round-8
    unbounded-growth hole, pinned at the unit level; the Spark-level
    pin is tests/test_streaming_soak.py)."""
    base = 1_700_000_000_000_000
    arrival = [("click", base + i * 200_000_000) for i in range(200)]
    _, sizes = _drive(arrival, [10] * 20, fire_timeouts=False)
    # 200s between clicks, 60s delay -> at most the last batch's 10
    # clicks can sit above the watermark
    assert max(sizes) <= 11, sizes
    assert sizes[-1] <= 11


def test_funnel_timeout_never_fires_on_signed_up_users():
    """The defensive branch: a (bogus) timeout invocation on a user
    with a signup must keep the state intact."""
    state = FakeGroupState()
    state.update((123, [456], []))
    state.hasTimedOut = True
    assert list(_funnel_step((7,), [], state)) == []
    assert state.exists and state.get[0] == 123

def test_funnel_wm_fallback_is_narrow_and_loud():
    """Round-10: only PySparkRuntimeError (the NoTimeout/no-watermark
    harness error) is absorbed by the watermark/timeout accessors — a
    REAL engine failure must propagate, not silently disable eviction
    — and the absorbed case warns once per worker."""
    import warnings

    import pytest
    from pyspark.errors import PySparkRuntimeError

    import hive_service_spark.streaming.events as ev_mod

    base = 1_700_000_000_000_000

    class HarnessState(FakeGroupState):
        def getCurrentWatermarkMs(self):
            raise PySparkRuntimeError(
                errorClass="CANNOT_WITHOUT",
                messageParameters={"condition1": "x", "condition2": "y"},
            )

        def setTimeoutTimestamp(self, ts_ms):
            raise PySparkRuntimeError(
                errorClass="CANNOT_WITHOUT",
                messageParameters={"condition1": "x", "condition2": "y"},
            )

    pdf = pd.DataFrame({"event_type": ["click"], "t": [base]})
    state = HarnessState()
    ev_mod._WM_FALLBACK_WARNED = False
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = list(_funnel_step((7,), [pdf], state))
    assert len(out) == 1 and int(out[0].iloc[0]["depth"]) == 0
    assert state.exists  # fallback wm=0 keeps the candidate
    msgs = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("watermark" in m or "timeout arm" in m for m in msgs)
    # second engagement in the same worker stays quiet
    with warnings.catch_warnings(record=True) as again:
        warnings.simplefilter("always")
        list(_funnel_step((7,), [pdf], HarnessState()))
    assert not [w for w in again if w.category is RuntimeWarning]

    class BrokenState(FakeGroupState):
        def getCurrentWatermarkMs(self):
            raise RuntimeError("real engine failure")

    with pytest.raises(RuntimeError, match="real engine failure"):
        list(_funnel_step((7,), [pdf], BrokenState()))

    class BrokenArm(FakeGroupState):
        def setTimeoutTimestamp(self, ts_ms):
            raise RuntimeError("real arm failure")

    with pytest.raises(RuntimeError, match="real arm failure"):
        list(_funnel_step((7,), [pdf], BrokenArm()))
