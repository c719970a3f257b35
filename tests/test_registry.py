"""Registry hygiene: the driver-contract ordering lists stay coherent.

A rename in queries.py must not silently drop a rows-only production
query from the bench/driver surface (_ROWS_ONLY_PRIORITY names are the
high-value compositions listed first after the hashed window)."""

from __future__ import annotations

from cngi_prototype_spark import queries as Q


def test_rows_only_priority_names_resolve():
    rows_only = {k for k, v in Q._REGISTRY.items() if v[1] is None}
    missing = [k for k in Q._ROWS_ONLY_PRIORITY if k not in rows_only]
    assert not missing, (
        f"_ROWS_ONLY_PRIORITY names no longer registered rows-only: "
        f"{missing} (renamed or given an oracle without updating the "
        f"priority list)")


def test_priority_list_has_no_duplicates():
    assert len(Q._ROWS_ONLY_PRIORITY) == len(set(Q._ROWS_ONLY_PRIORITY))


def test_oracled_gates_fit_driver_window():
    oracled = [k for k, v in Q._REGISTRY.items() if v[1] is not None]
    assert len(oracled) <= Q._DRIVER_WINDOW


def test_bench_queries_resolve():
    import bench

    qs = Q.queries()
    for name in bench.BENCH_QUERIES:
        assert (name in bench.BENCH_OVERRIDES or name in qs
                or hasattr(Q, f"{name}_q")), name


def test_get_framework_client_returns_active_session(spark):
    from cngi_prototype_spark.session import get_framework_client
    assert get_framework_client() is spark


def test_timed_runs_steal_guard(monkeypatch):
    """_timed_runs: clean windows stay at 6 runs; a >2x spread triggers
    up to 3 extra runs; the guard stops early once the spread closes
    (it cannot, with a min already recorded — extras are bounded)."""
    import bench

    clock = [0.0]
    durations: list[float] = []

    def fake_run(img):
        clock[0] += durations.pop(0)

    monkeypatch.setattr(bench, "_run", fake_run)
    monkeypatch.setattr(bench.time, "time", lambda: clock[0])

    durations[:] = [1.0, 1.1, 0.9, 1.0, 1.05, 0.95]
    runs = bench._timed_runs(None)
    assert len(runs) == 6 and min(runs) == 0.9

    # burst polluted the window: 3 extras fire (spread stays > 2)
    durations[:] = [5.0, 5.5, 6.0, 5.2, 1.0, 5.1, 1.2, 1.1, 1.0]
    runs = bench._timed_runs(None)
    assert len(runs) == 9 and min(runs) == 1.0
