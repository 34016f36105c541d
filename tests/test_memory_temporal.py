"""Server memory budget (memory.rs parity) and vault temporal analysis
(temporal_analysis.rs parity)."""

import math

import grpc
import pytest

from neumann_tpu.server.memory import (
    MemoryBudgetConfig,
    MemoryTracker,
    Reservation,
)
from neumann_tpu.vault.temporal import (
    TemporalConfig,
    analyze_temporal_patterns,
    analyze_vault_access,
    autocorrelation,
    detect_drift,
    find_dominant_period,
)


class TestMemoryTracker:
    def test_accounting(self):
        t = MemoryTracker(MemoryBudgetConfig(max_bytes=100))
        assert t.try_allocate(60)
        assert t.current_usage() == 60 and t.remaining() == 40
        assert not t.try_allocate(50)          # shed
        t.release(60)
        assert t.current_usage() == 0
        assert t.stats()["shed_requests"] == 1
        assert t.stats()["peak"] == 60

    def test_shedding_disabled_tracks_anyway(self):
        t = MemoryTracker(MemoryBudgetConfig(max_bytes=10,
                                             load_shedding=False))
        assert t.try_allocate(50)
        assert t.is_over_budget()

    def test_reservation_context(self):
        t = MemoryTracker(MemoryBudgetConfig(max_bytes=100))
        with Reservation(t, 80) as r:
            assert r.ok and t.current_usage() == 80
            with Reservation(t, 80) as r2:
                assert not r2.ok
        assert t.current_usage() == 0

    def test_server_sheds_over_budget(self):
        from neumann_tpu.server import neumann_pb2 as pb
        from neumann_tpu.server.server import NeumannServer

        srv = NeumannServer(memory_budget_bytes=16384)
        port = srv.serve()
        try:
            chan = grpc.insecure_channel(f"127.0.0.1:{port}")
            call = chan.unary_unary(
                "/neumann.QueryService/Execute",
                request_serializer=pb.QueryRequest.SerializeToString,
                response_deserializer=pb.QueryResponse.FromString)
            # small request fits the budget
            out = call(pb.QueryRequest(query="SELECT 1"), timeout=10)
            assert out is not None
            # 4x working-set estimate (~20 KiB) exceeds the budget
            big = "SELECT 1 -- " + "x" * 4096
            with pytest.raises(grpc.RpcError) as ei:
                call(pb.QueryRequest(query=big), timeout=10)
            assert ei.value.code() == grpc.StatusCode.RESOURCE_EXHAUSTED
            chan.close()
        finally:
            srv.stop()


class TestTemporal:
    def test_autocorrelation_and_period(self):
        series = [10, 1, 1, 1, 10, 1, 1, 1, 10, 1, 1, 1, 10, 1, 1, 1]
        assert autocorrelation(series, 4) > 0.7
        assert find_dominant_period(series) == 4
        flat = [5.0] * 20
        assert find_dominant_period(flat) == 0

    def test_drift(self):
        d = detect_drift([1, 1, 1, 1, 5, 5, 5, 5], 0.5)
        assert d.drifting and d.relative_change == pytest.approx(4.0)
        d2 = detect_drift([3, 3, 3, 3, 3, 3], 0.5)
        assert not d2.drifting

    def test_seasonal_daily_rhythm(self):
        # hourly accesses with a clean daily (24-bucket) rhythm
        ts = []
        for day in range(4):
            for hour in range(24):
                base = day * 86400 + hour * 3600
                n = 6 if 9 <= hour < 17 else 1
                ts.extend(base + i for i in range(n))
        rep = analyze_temporal_patterns(ts, TemporalConfig())
        assert rep.seasonal is not None
        assert rep.seasonal.period_buckets % 24 == 0
        assert rep.drift is not None and not rep.drift.drifting
        assert rep.bursts == []

    def test_burst_detection(self):
        ts = [h * 3600.0 for h in range(48)]           # 1/bucket flat
        ts.extend(20 * 3600.0 + i for i in range(50))  # spike in bucket 20
        rep = analyze_temporal_patterns(ts, TemporalConfig())
        assert rep.bursts == [20]

    def test_too_few_buckets(self):
        rep = analyze_temporal_patterns([1.0, 2.0], TemporalConfig())
        assert rep.seasonal is None and rep.drift is None
        assert rep.as_dict()["buckets"]

    def test_vault_integration(self):
        from neumann_tpu.store.tensor_store import TensorStore
        from neumann_tpu.vault.vault import TensorVault

        v = TensorVault(TensorStore(), "pw")
        for i in range(40):
            v.set(f"s{i % 4}", f"v{i}", actor="root")
            v.get(f"s{i % 4}", actor="root")
        rep = analyze_vault_access(v, config=TemporalConfig(
            bucket_seconds=0.001, min_buckets=1))
        assert sum(rep.buckets) >= 80
        rep_none = analyze_vault_access(
            v, actor="ghost",
            config=TemporalConfig(bucket_seconds=1.0))
        assert rep_none.buckets == []


class TestTemporalMath:
    def test_autocorrelation_exact_value(self):
        series = [1.0, 2.0, 1.0, 2.0]
        # mean 1.5, var 1.0; lag 2: ((-.5)(-.5) + (.5)(.5)) = 0.5
        assert autocorrelation(series, 2) == pytest.approx(0.5)
        assert autocorrelation(series, 0) == 0.0
        assert autocorrelation(series, 4) == 0.0
        assert autocorrelation([3.0, 3.0, 3.0], 1) == 0.0

    def test_period_two_detected(self):
        series = [9, 1] * 8
        assert find_dominant_period(series) == 2

    def test_drift_exact_rates(self):
        d = detect_drift([2, 4, 6, 6], 0.1)
        assert d.early_rate == pytest.approx(3.0)
        assert d.late_rate == pytest.approx(6.0)
        assert d.relative_change == pytest.approx(1.0)

    def test_config_frozen_reports(self):
        from neumann_tpu.vault.temporal import (
            DriftDetection,
            SeasonalPattern,
        )

        with pytest.raises(Exception):
            SeasonalPattern(2, 0.5).strength = 1.0
        with pytest.raises(Exception):
            DriftDetection(True, 1, 2, 1).drifting = False

    def test_bucketize_span(self):
        from neumann_tpu.vault.temporal import bucketize

        assert bucketize([0.0, 0.5, 1.0, 2.2], 1.0) == [2, 1, 1]
        assert bucketize([], 1.0) == []


class TestMutationKills:
    def test_budget_defaults_and_boundaries(self):
        assert MemoryBudgetConfig().max_bytes == 1 << 30
        t = MemoryTracker(MemoryBudgetConfig(max_bytes=100))
        assert t.try_allocate(100)          # exactly at budget: allowed
        assert not t.is_over_budget()       # at budget != over budget
        t2 = MemoryTracker(MemoryBudgetConfig(max_bytes=100,
                                              load_shedding=False))
        t2.try_allocate(100)
        assert not t2.is_over_budget()

    def test_reservation_propagates_exceptions(self):
        t = MemoryTracker(MemoryBudgetConfig(max_bytes=100))
        with pytest.raises(RuntimeError):
            with Reservation(t, 10):
                raise RuntimeError("boom")
        assert t.current_usage() == 0

    def test_autocorrelation_vs_numpy_oracle(self):
        import numpy as np

        rng = np.random.default_rng(3)
        series = rng.normal(size=32).tolist()
        for lag in (1, 3, 7):
            x = np.asarray(series)
            m = x.mean()
            want = float(((x[:-lag] - m) * (x[lag:] - m)).sum()
                         / ((x - m) ** 2).sum())
            assert autocorrelation(series, lag) == pytest.approx(want)
