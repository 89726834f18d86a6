"""Adaptive fused-block policy + recommendation engine (runtime/policy.py)."""

from fireredtts2_tpu.runtime.policy import (
    AdaptiveBlockPolicy, BlockPolicyConfig, RecommendationEngine,
)


def _feed(policy, k, wall_ms, n=4):
    for _ in range(n):
        policy.record(k, wall_ms / 1000.0)


def test_first_observation_per_k_is_discarded():
    p = AdaptiveBlockPolicy()
    p.record(4, 120.0)  # "compile" block: 2 minutes
    p.record(4, 0.100)
    snap = p.snapshot()
    assert snap["wall_ms_per_block"][4] == 100.0


def test_estimate_fits_rtt_and_frame_cost():
    p = AdaptiveBlockPolicy(BlockPolicyConfig(ladder=(1, 4, 16)))
    # wall(K) = 30 + 5*K ms
    for k in (1, 4, 16):
        _feed(p, k, 30 + 5 * k)
    rtt, fc = p.estimate()
    assert abs(rtt - 30) < 1e-6 and abs(fc - 5) < 1e-6


def test_choose_smallest_realtime_k():
    p = AdaptiveBlockPolicy(BlockPolicyConfig(ladder=(1, 2, 4, 8, 16),
                                              headroom=1.25))
    # rtt 30 ms, frame 5 ms: per-frame wall at K=1 is 35 (realtime bar is
    # 80/1.25 = 64 ms) -> K=1 already realtime.
    for k in (1, 4):
        _feed(p, k, 30 + 5 * k)
    assert p.choose(pending=False, active=4) == 1
    # rtt 300 ms, frame 30 ms: K=1 -> 330; K=2 -> 180; K=4 -> 105; K=8 ->
    # 67.5; K=16 -> 48.75. Bar is 64 -> smallest realtime K is 16.
    p2 = AdaptiveBlockPolicy(BlockPolicyConfig(ladder=(1, 2, 4, 8, 16),
                                               headroom=1.25))
    for k in (1, 4, 16):
        _feed(p2, k, 300 + 30 * k)
    assert p2.choose(pending=False, active=4) == 16


def test_choose_pending_and_throughput_modes():
    cfg = BlockPolicyConfig(ladder=(1, 4, 16), start_block=4)
    p = AdaptiveBlockPolicy(cfg)
    assert p.choose(pending=True, active=1) == 1       # fast admission
    assert p.choose(pending=False, active=1) == 4      # no data yet
    # Hopelessly slow (frame cost 200 ms): no K is realtime -> largest
    # ladder K under the cadence cap (throughput mode).
    for k in (1, 16):
        _feed(p, k, 100 + 200 * k)
    assert p.choose(pending=False, active=1) == 16


def test_probe_second_ladder_point_without_admission_pressure():
    """ADVICE r2: with admissions never queueing, the policy must still
    dispatch probe blocks at a second K so the wall(K) fit forms."""
    cfg = BlockPolicyConfig(ladder=(1, 4, 16), start_block=4, probe_after=8)
    p = AdaptiveBlockPolicy(cfg)
    p.record(4, 0.120)  # compile, discarded
    # steady blocks at start_block only -> pinned at 4 until probe_after
    for _ in range(7):
        p.record(4, 0.050)
        assert p.choose(pending=False, active=2) == 4
    p.record(4, 0.050)  # 8th steady block
    probe = p.choose(pending=False, active=2)
    assert probe == 1   # nearest in-cadence neighbor of 4
    # the probe K's first record is its compile; keep probing until it lands
    p.record(probe, 0.090)
    assert p.choose(pending=False, active=2) == probe
    p.record(probe, 0.045)
    # two distinct K measured -> the fit exists and choose() uses it
    assert p.estimate() is not None
    assert p.snapshot()["rtt_ms"] is not None
    assert p.choose(pending=False, active=2) in cfg.ladder


def test_recommendation_rules_fire():
    eng = RecommendationEngine(fpl_warn_ms=200.0, device_budget_ms=8.0)
    recs = eng.evaluate({
        "first_packet_p95_ms": 450.0,
        "active_streams": 12,
        "aggregate_rtf": 8.0,
        "queue_depth": 30,
        "device_ms_per_frame": 12.0,
        "chunk_drops": 2,
        "hbm_used_fraction": 0.97,
    })
    codes = {r.code for r in recs}
    assert codes == {"fpl_high", "overcommitted", "queue_backlog",
                     "device_regression", "slow_consumers", "hbm_pressure"}
    assert all(r.to_dict()["action"] for r in recs)


def test_recommendations_quiet_when_healthy():
    eng = RecommendationEngine(device_budget_ms=8.0)
    assert eng.evaluate({
        "first_packet_p95_ms": 90.0,
        "active_streams": 4,
        "aggregate_rtf": 15.0,
        "queue_depth": 0,
        "device_ms_per_frame": 7.0,
        "chunk_drops": 0,
        "hbm_used_fraction": 0.5,
    }) == []
