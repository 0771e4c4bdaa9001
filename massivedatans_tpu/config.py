"""Run configuration.

Mirrors the reference's environment-variable flag system (survey §5; reference
``sample.py:131-197``, ``multi_nested_sampler.py:422-428``) and adds the knobs
that only exist in the TPU engine (proposal batch sizes, static capacities).
"""

from __future__ import annotations

import dataclasses
import os


def _env_int(name: str, default: int) -> int:
    return int(os.environ.get(name, default))


def _env_str(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclasses.dataclass(frozen=True)
class RunConfig:
    # --- algorithm parameters (reference defaults) ---
    nlive_points: int = 400          # NLIVE_POINTS (sample.py:165)
    tolerance: float = 0.5           # sample.py:197
    nsuperset_draws: int = 10        # SUPERSET_DRAWS (sample.py:188)
    max_samples: int = 0             # MAXSAMPLES (sample.py:195); 0 = unlimited
    min_samples: int = 0             # MINSAMPLES (sample.py:196)
    constrainer: str = "MLFRIENDS"   # CONSTRAINER: MLFRIENDS | RADFRIENDS |
                                     # SUPFRIENDS | MULTIELLIPSOIDS | SLICE |
                                     # GALILEAN
    metriclearner: str = "truncatedscaling"  # sample.py:134
    slice_direction: str = "iterate"  # SLICE proposal direction: iterate |
                                      # random | mahalanobis
                                      # (whitenedmcmc.py:200-264 family)
    force_shrink: bool = True        # sample.py:134
    nbootstraps: int = 10            # radfriendsregion.py:59
    radius_estimator: str = "bootstrap"  # bootstrap | jackknife (the
                                     # friends.py:30-33 jackknife option:
                                     # leave-one-out max-NN radius)
    phantom_capacity: int = 0        # keep_phantom_points (friends.py:54-59,
                                     # 81-84): carry the Q highest-L dead
                                     # points as extra region members so
                                     # freshly-dead modes stay covered;
                                     # 0 = off (the reference default).
                                     # Requires force_shrink, as upstream.
    check_every: int = 50            # tolerance-check cadence in iterations
                                     # (multi_nested_integrator.py:136); runs
                                     # on-device (engine.device_termination);
                                     # max_samples is enforced immediately
    stall_limit: int = 0             # iterations with an unfillable shelf before a
                                     # dataset is force-terminated; 0 = auto

    # --- TPU engine knobs (no reference equivalent) ---
    proposal_batch: int = 512        # raw region proposals per fill round
    eval_batch: int = 128            # candidates scored per fill round (matmul rows)
    shelf_capacity: int = 16         # per-dataset queue depth (reference: unbounded list)
    member_capacity: int = 0         # region member cap; 0 = auto (2*nlive rounded up)
    pile_capacity: int = 0           # point-pile cap; 0 = auto
    max_fill_rounds: int = 1024      # safety cap on fill loop per NS iteration
                                     # (also bounds worst-case single-program
                                     # run time: device watchdogs kill
                                     # minutes-long executions)
    chunk_fill_budget: int = 0       # total fill rounds allowed per device
                                     # dispatch (across all chunk_iters
                                     # iterations); 0 = unlimited. Bounds a
                                     # dispatch's wall time when fills
                                     # escalate (decoupled regime / phase
                                     # transitions): remote TPU workers kill
                                     # minutes-long executions. Truncated
                                     # fills are bias-free (per-dataset
                                     # volume ledger) and resume next chunk.
    region_rebuild_every: int = 10   # NS iterations between geometry rebuilds
                                     # (fallback cadence when region_rebuild_draws
                                     # is 0; stale regions are supersets of the
                                     # current contour, so correctness is
                                     # unaffected)
    region_rebuild_draws: int = 1000  # rebuild the main geometry after this
                                     # many likelihood-evaluated candidates —
                                     # the REFERENCE cadence (rebuild_every=1000
                                     # draws, sample.py:134, hiermetriclearn.py:
                                     # 200-211). Draw-based cadence self-tunes:
                                     # easy phases (~15 valid draws/iter) rebuild
                                     # every ~60 iterations instead of every 10
                                     # (each rebuild sorts the [K*D] live-index
                                     # set — ~45% of steady-state chunk time at
                                     # the old iteration cadence), hard phases
                                     # rebuild as often as the contour moves.
                                     # 0 = use region_rebuild_every iterations.
    eval_batch_max: int = 0          # host-side eval-batch escalation ceiling
                                     # (integrator, single-device path): when a
                                     # chunk's measured fill-rounds/iteration
                                     # exceeds a threshold, the next dispatches
                                     # use this batch size (own cached
                                     # executable). Per-round device cost is
                                     # nearly flat in the batch (fixed [*, D]
                                     # shelf/threshold work dominates), so hard
                                     # phases finish in ~B_max/B fewer rounds
                                     # while easy phases keep evaluation parity
                                     # at the small batch. 0 = disabled.
    chunk_iters: int = 50            # NS iterations per device dispatch
    pipeline_lookahead: int = 1      # extra chunks kept in flight: the device
                                     # computes chunk k+1 while the host blocks
                                     # on chunk k's report (hides dispatch/
                                     # transfer round trips); costs at most
                                     # `lookahead` wasted no-op chunks at
                                     # termination. 0 = fully synchronous.
    seed: int = 1                    # numpy.random.seed(1) (sample.py:162)
    matmul_precision: str = "highest"  # likelihood/distance matmul precision
    use_focus: bool = True           # focused (empty-shelf) region after superset draws
    use_groups: bool = True          # connected-component group decomposition (host)
    group_refresh_chunks: int = 0    # fetch live_idx + recompute group labels
                                     # every Nth chunk. The [K, D] live_idx
                                     # payload is 16 MB at D=10^4 through a
                                     # ~4-10 MB/s tunnel and labels are purely
                                     # advisory (column-focus cycling), so
                                     # large-D runs refresh on a cadence.
                                     # 0 = auto: every chunk while K*D <= 2^20,
                                     # else every 4th chunk.
    use_column_focus: bool = True    # late-run direct proposals around empty
                                     # datasets' own live points (engine
                                     # _column_proposals); activates when the
                                     # datasets have decoupled into more than
                                     # column_focus_groups components
    column_focus_groups: int = 8
    column_focus_fallback_rounds: int = 12  # fill rounds within one NS
                                     # iteration after which column proposals
                                     # activate REGARDLESS of the group count:
                                     # datasets can be likelihood-decoupled
                                     # (disjoint contours) long before they
                                     # stop sharing pile points, in which case
                                     # the group heuristic says "1 group" while
                                     # union-region sampling efficiency has
                                     # collapsed (observed: 1.25% valid at
                                     # MUSE iteration 22k). 0 disables.
    column_proposal_batch: int = 0   # raw column-proposal pool compacted to
                                     # eval_batch valid candidates before the
                                     # likelihood matmul; 0 = proposal_batch.
                                     # Proposals + membership tests cost ~us
                                     # next to a wide likelihood round, so in
                                     # low-acceptance regimes (late MUSE) a
                                     # 8-32x pool keeps matmul occupancy ~100%
    column_slots: int = 128          # distinct candidate columns per round:
                                     # per-column radius/bounds are computed
                                     # once per slot (bounds the K x K x slots
                                     # jackknife pass independently of D)

    def __post_init__(self):
        if self.phantom_capacity > 0 and not self.force_shrink:
            # phantom members may only EXTEND coverage; without force_shrink
            # they would inflate the radius estimate itself (the reference's
            # assert, friends.py:54-55)
            raise ValueError("phantom_capacity > 0 requires force_shrink")
        if self.radius_estimator not in ("bootstrap", "jackknife"):
            raise ValueError(
                f"unknown radius_estimator {self.radius_estimator!r}"
            )

    @classmethod
    def from_env(cls, **overrides) -> "RunConfig":
        """Build a config honoring the reference's env flags, then overrides."""
        kw = dict(
            nlive_points=_env_int("NLIVE_POINTS", cls.nlive_points),
            nsuperset_draws=_env_int("SUPERSET_DRAWS", cls.nsuperset_draws),
            max_samples=_env_int("MAXSAMPLES", cls.max_samples),
            min_samples=_env_int("MINSAMPLES", cls.min_samples),
            constrainer=_env_str("CONSTRAINER", cls.constrainer),
            slice_direction=_env_str("SLICE_DIRECTION", cls.slice_direction),
            radius_estimator=_env_str(
                "RADIUS_ESTIMATOR", cls.radius_estimator
            ),
            phantom_capacity=_env_int("PHANTOM_POINTS", cls.phantom_capacity),
            # USE_GRAPH selects the subset-decomposition path in the
            # reference (sample.py:189); here it gates the host-side
            # connected-component decomposition entirely
            use_groups=bool(_env_int("USE_GRAPH", int(cls.use_groups))),
            # TPU engine knobs (no reference equivalent, MDT_ prefix)
            eval_batch=_env_int("MDT_EVAL_BATCH", cls.eval_batch),
            eval_batch_max=_env_int("MDT_EVAL_BATCH_MAX", cls.eval_batch_max),
            region_rebuild_draws=_env_int(
                "MDT_REBUILD_DRAWS", cls.region_rebuild_draws
            ),
        )
        kw.update(overrides)
        return cls(**kw)

    def resolve_member_capacity(self, ndata: int) -> int:
        if self.member_capacity:
            return self.member_capacity
        # During the superset phase fewer than 2*nlive unique points exist
        # whenever datasets are still coupled (multi_nested_sampler.py:218-224).
        cap = max(2 * self.nlive_points, 256)
        # at many datasets the late-run live-point union fans out well past
        # 2*nlive once datasets decouple (member_overflow diagnostics at
        # N=10^4 and in deep MUSE runs); overflow keeps a random subsample
        # (engine._dedup_random) so correctness holds either way, but a
        # roomier region wastes fewer proposals
        if ndata > 16:
            cap = max(cap, 4 * self.nlive_points)
        return _round_up(cap, 128)

    def resolve_pile_capacity(self, ndata: int) -> int:
        if self.pile_capacity:
            cap = self.pile_capacity
        else:
            # Dead-point coordinates are reconstructed from the pile
            # host-side, so the pile should comfortably hold every accepted
            # point of a deep run WITHOUT compaction (compaction retraces
            # with new shapes — expensive through a remote compile service).
            # HBM cost is trivial: 2^21 rows x ndim floats x 2 arrays
            # ~ 80 MB at ndim=5.
            cap = max(
                1 << 21,
                self.nlive_points * 8
                + self.shelf_capacity * min(ndata, 4096)
                + 65536,
            )
        cap = _round_up(cap, 1024)
        # pile indices ride device->host reports as exact float32
        # (engine.chunk_report_parts); beyond 2^24 that round-trip loses bits
        if cap >= 1 << 24:
            raise ValueError(
                f"pile_capacity {cap} >= 2^24 would break exact f32 "
                "index transport; shard datasets instead"
            )
        return cap


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
