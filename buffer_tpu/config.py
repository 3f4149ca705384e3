"""Configuration system for buffer_tpu.

Typed dataclass trees mirroring the reference's easydict configs
(``ThreeDMatch/config.py:5-71``, ``KITTI/config.py:5-71``,
``generalization/*/config.py``) with the same field names, plus a
TPU-specific :class:`StaticConfig` describing the padded static shapes that
XLA compilation requires (the reference instead uses ragged arrays sized at
runtime by its neighbor-calibration step, ``ThreeDMatch/dataloader.py:18-51``).

Presets: ``threedmatch``, ``threedlomatch``, ``kitti``, and the four
generalization suites (``threed2eth``, ``threed2kitti``, ``kitti2threed``,
``kitti2eth``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Dict, Tuple


@dataclass(frozen=True)
class DataConfig:
    """Mirrors ``_C.data`` (ThreeDMatch/config.py:8-15)."""

    dataset: str = "3DMatch"
    root: str = "data/ThreeDMatch"
    downsample: float = 0.02          # first voxel downsampling
    voxel_size_0: float = 0.035       # second voxel downsampling
    voxel_size_1: float = 0.035       # model's native voxel size (for scale)
    max_numPts: int = 30000
    manual_seed: int = 123


@dataclass(frozen=True)
class TrainConfig:
    """Mirrors ``_C.train`` (ThreeDMatch/config.py:18-26)."""

    epoch: int = 10
    max_iter: int = 50000
    batch_size: int = 1
    num_workers: int = 0
    pos_num: int = 512
    augmentation_noise: float = 0.001
    pretrain_model: str = ""
    all_stage: Tuple[str, ...] = ("Ref", "Desc", "Keypt", "Inlier")


@dataclass(frozen=True)
class TestConfig:
    """Mirrors ``_C.test`` (ThreeDMatch/config.py:29-32).

    ``scale`` (= voxel_size_0 / voxel_size_1) divides every conv neighborhood
    offset (reference ``models/point_learner.py:343,495``) and is the entire
    cross-domain adaptation mechanism of the generalization suites
    (``generalization/ThreeD2ETH/config.py:19``).
    """

    scale: float = 1.0
    experiment_id: str = "tpu"
    pose_refine: bool = True


@dataclass(frozen=True)
class OptimConfig:
    """Mirrors ``_C.optim`` (ThreeDMatch/config.py:35-39)."""

    lr: Dict[str, float] = field(
        default_factory=lambda: {"Ref": 0.005, "Desc": 0.001, "Keypt": 0.001, "Inlier": 0.001}
    )
    lr_decay: float = 0.50
    weight_decay: float = 1e-6
    scheduler_interval: Dict[str, int] = field(
        default_factory=lambda: {"Ref": 1, "Desc": 2, "Keypt": 1, "Inlier": 1}
    )


@dataclass(frozen=True)
class PointConfig:
    """Mirrors ``_C.point`` (ThreeDMatch/config.py:42-48)."""

    in_points_dim: int = 3
    in_feats_dim: int = 3
    first_feats_dim: int = 32
    conv_radius: float = 2.0
    keypts_th: float = 0.1
    num_keypts: int = 1500


@dataclass(frozen=True)
class PatchConfig:
    """Mirrors ``_C.patch`` (ThreeDMatch/config.py:51-58)."""

    des_r: float = 0.3
    num_points_per_patch: int = 512
    rad_n: int = 3
    azi_n: int = 20
    ele_n: int = 7
    delta: float = 0.8
    voxel_sample: int = 10


@dataclass(frozen=True)
class MatchConfig:
    """Mirrors ``_C.match`` (ThreeDMatch/config.py:61-66).

    The reference feeds these to Open3D RANSAC (``models/BUFFER.py:318-324``);
    here they parameterize the batched JAX RANSAC in
    :mod:`buffer_tpu.pipeline.ransac`.
    """

    dist_th: float = 0.10
    inlier_th: float = 1.0 / 3.0
    similar_th: float = 0.8
    confidence: float = 0.999
    iter_n: int = 50000
    # TPU-native knob: number of RANSAC hypotheses evaluated in one batched
    # round (all scored in parallel on the MXU rather than sequentially).
    # RANSAC here runs on the voting stage's inlier set (high precision,
    # like the reference feeding Open3D identity correspondences on the
    # winner's inliers, models/BUFFER.py:314-324).  At 0.999 confidence an
    # inlier ratio as low as 0.2 needs ~860 3-point draws; 1024 batched
    # hypotheses cover that with margin (4096 measured ~0.7 ms slower,
    # recall-identical on the 50-pair gate)
    hypotheses: int = 1024


@dataclass(frozen=True)
class StaticConfig:
    """TPU-only: the static padded-shape plan.

    The reference works with ragged arrays whose sizes are data dependent
    (points per cloud, neighbors per point, matches per pair).  XLA requires
    static shapes, so every such array is padded to the sizes below and
    carried with a validity mask.  Shadow-neighbor semantics follow the
    reference (index == N means "no neighbor": zero feature, query-point
    coordinate — ``models/point_learner.py:328-349``).
    """

    # per-cloud padded point counts for the 3-level conv pyramid.
    # l1/l2 sized from measured subsample ratios on 30k-point clouds
    # (l1 <= ~9.5k, l2 <= ~2.6k at 3DMatch density) — r2's 12288/4096 plan
    # carried ~60% padding waste through every per-level op
    points_l0: int = 30720
    points_l1: int = 10240
    points_l2: int = 3072
    # padded size of the raw (first-downsample) cloud used for patch queries
    raw_points: int = 65536
    # neighbor-list caps per level.  The reference derives these by
    # 80th-percentile calibration at loader construction
    # (ThreeDMatch/dataloader.py:18-51): on 2D-manifold point clouds at
    # conv_radius=2.0 that percentile is ~16 (measured, scripts/calibrate.py
    # math on gate scenes; max observed ~21) — NOT the volumetric geometric
    # bound 34 that r2 shipped.  20 covers the ~99th percentile; besides the
    # ~40% cut in every per-neighbor cost it also matches the reference's
    # shadow-counting mean denominator (~its calibrated width) far better
    # than 34 did — bench mutual matches went UP 589 -> 690 and sanity
    # RTE/RRE improved when this landed (BENCH history r3).
    # r5: 20 -> 16 = the reference's own calibration percentile (p80).
    # Bench 40.5 -> 34.7 ms/pair (every per-neighbor cost: gathers,
    # relayouts, conv matmuls, -20%); sanity RTE 3.2 -> 5.9 mm and mutual
    # 742 -> 730 (within the gate noise band); the full 100/50/50 quality
    # gates were re-run green at this state (QUALITY.json).
    neighbor_caps: Tuple[int, int, int] = (16, 16, 16)
    pool_caps: Tuple[int, int] = (16, 16)
    # matches kept after mutual matching (pad/truncate)
    max_matches: int = 1500
    # IRLS refinement rounds (reference: 20, models/BUFFER.py:396-398)
    # the reference's IRLS loop breaks when the inlier set stabilizes —
    # typically after 2-5 rounds (models/BUFFER.py:382-418, 20 max); 10
    # fixed rounds is still well past convergence and halves the
    # (latency-bound) [1500]-scale scan on device
    refine_iters: int = 10
    # kNN used for PCA normal estimation (Open3D's default is 30; kept at
    # the conv cap width so the shared level-0 kNN pass serves both —
    # sanity RTE/RRE and the quality gates held at 16, r5)
    normal_knn: int = 16
    # chunk size for tiled distance computations on device
    knn_chunk: int = 4096
    # half-width of the rank window for banded neighbor search on
    # Morton-ordered clouds (data/preprocess.morton_sort); 0 disables.
    # Ignored automatically when 2*band >= support size (the search is
    # then exact-full, via the Pallas kernel only when its window spans
    # the whole grid), so tiny test configs and unsorted inputs fall back
    # to the full search.  On the Pallas path the realized window is
    # ceil(2*band/128) rows rounded up to 16 (kernels/geom_pallas.
    # banded_win_rows); 4096 = the tuned 64x128 window (+-4096 ranks —
    # 3072 saved ~1 ms but cost a quality-gate pair).
    knn_band: int = 4096
    # inference descriptor front-end: gather-free fused SPT (True) vs the
    # reference-exact sampled SPT (False); training always uses sampled
    fused_desc: bool = True
    # dynamic solver budget (r5, VERDICT r4 "Next #4"): when fewer than
    # low_match_th mutual matches survive (hard low-overlap pairs), run
    # RANSAC with 4x hypotheses and IRLS at 2x depth via lax.cond — only
    # the taken branch executes, so ordinary pairs (mutual ~600-750 at
    # 3DMatch scale) pay nothing.  The reference implicitly does this:
    # Open3D RANSAC iterates to a confidence criterion and its IRLS
    # breaks on convergence, so ITS work grows when inliers are scarce
    # (models/BUFFER.py:318-324,396-398).
    low_match_boost: bool = True
    low_match_th: int = 400
    # pairs registered per jitted step (vmap over the pair axis).  A BENCH
    # EXPERIMENT KNOB ONLY: bench.py reads it to vmap its measurement loop;
    # make_register_fn and the eval harness always register one pair per
    # step.  1 is the measured optimum on one chip: vmap's leading batch dim
    # re-layouts the Pallas kernels and every gather, costing far more than
    # it amortizes (r3 bench: 50.3 ms/pair at P=1, 85.2 at P=2, 98.3 at
    # P=4).  Multi-pair throughput scales across chips via DP
    # (eval/harness.make_dp_register) instead.
    pair_batch: int = 1
    # pairs registered per jitted step by STATIC UNROLL — U independent
    # ``register_pair`` traces in one XLA program (NOT a vmap: each pair
    # keeps its optimal single-pair layouts).  HONEST WIN IS MODEST:
    # 40.5 -> 38.8 ms/pair at U=3 on the 3DMatch plan (r5).  The v5e has
    # ONE TensorCore, so kernels/fusions of the U chains still execute
    # strictly sequentially; interleaving only overlaps DMA latency with
    # the other chain's compute.  (Apparent 2-3x wins in early r5
    # measurements were artifacts: shared-input CSE across chains, then
    # dead-code elimination of unconsumed chains — both documented in
    # bench.py.  The r3 vmap experiment, pair_batch above, LOSES
    # throughput because vmap re-layouts every op.)  U=4's XLA compile
    # went superlinear (>25 min vs ~80 s) and was abandoned — the same
    # pathology class as the KITTI-plan compile.  Used by the
    # single-device eval harness (pairs stream in groups of U) and
    # bench.py; per-pair results match U=1 behaviorally (same trace per
    # pair; fusion boundaries may round a few ulps differently).
    pair_unroll: int = 3


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    point: PointConfig = field(default_factory=PointConfig)
    patch: PatchConfig = field(default_factory=PatchConfig)
    match: MatchConfig = field(default_factory=MatchConfig)
    static: StaticConfig = field(default_factory=StaticConfig)
    # runtime-injected in the reference (ThreeDMatch/train.py:99-103)
    stage: str = "test"

    def with_stage(self, stage: str) -> "Config":
        return replace(self, stage=stage)

    def replace(self, **kw) -> "Config":
        return replace(self, **kw)


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------

def threedmatch_cfg() -> Config:
    """3DMatch preset (ThreeDMatch/config.py)."""
    return Config()


def threedlomatch_cfg() -> Config:
    """3DLoMatch: identical to 3DMatch except the dataset/gt split
    (README.md:72-75, ThreeDMatch/dataset.py:63-66)."""
    c = threedmatch_cfg()
    return c.replace(data=replace(c.data, dataset="3DLoMatch"))


def kitti_cfg() -> Config:
    """KITTI odometry preset (KITTI/config.py)."""
    return Config(
        data=DataConfig(
            dataset="KITTI", root="data/KITTI", downsample=0.05,
            voxel_size_0=0.30, voxel_size_1=0.30, max_numPts=40000,
        ),
        train=TrainConfig(epoch=50, augmentation_noise=0.01),
        test=TestConfig(scale=1.0, experiment_id="tpu-kitti", pose_refine=False),
        optim=OptimConfig(
            scheduler_interval={"Ref": 5, "Desc": 10, "Keypt": 5, "Inlier": 5}
        ),
        point=PointConfig(keypts_th=0.5),
        patch=PatchConfig(des_r=3.0),
        match=MatchConfig(dist_th=0.30, inlier_th=2.0, similar_th=0.9,
                          confidence=1.0),
        # points_l1 20480 (not l0/2.5): 40k LiDAR sds points at the 0.6 m
        # level-1 cell measure ~17-19k survivors on synthetic street
        # scenes — 16384 silently truncated level 1
        # pair_unroll=1: the KITTI plan's XLA compile is already
        # superlinear (265 s at U=1, BENCH_KITTI_r04); a U=3 program
        # multiplies it past any practical budget for a ~4% win
        static=StaticConfig(points_l0=40960, points_l1=20480, points_l2=6144,
                            raw_points=131072, pair_unroll=1),
    )


def _gen(base: Config, dataset: str, root: str, voxel_size_0: float,
         voxel_size_1: float, downsample: float, max_pts: int,
         pose_refine: bool, keypts_th: float, des_r: float,
         match: MatchConfig, static: StaticConfig) -> Config:
    return base.replace(
        data=DataConfig(dataset=dataset, root=root, downsample=downsample,
                        voxel_size_0=voxel_size_0, voxel_size_1=voxel_size_1,
                        max_numPts=max_pts),
        test=TestConfig(scale=voxel_size_0 / voxel_size_1,
                        experiment_id=base.test.experiment_id,
                        pose_refine=pose_refine),
        point=replace(base.point, keypts_th=keypts_th),
        patch=replace(base.patch, des_r=des_r),
        match=match,
        static=static,
    )


def threed2eth_cfg() -> Config:
    """ETH data with 3DMatch weights (generalization/ThreeD2ETH/config.py:
    voxel 0.15 vs 0.03 => scale 5)."""
    return _gen(threedmatch_cfg(), "ETH", "data/ETH", 0.15, 0.03, 0.05,
                30000, False, 0.5, 1.0,
                MatchConfig(dist_th=0.20, inlier_th=1.5, similar_th=0.9,
                            confidence=1.0),
                StaticConfig())


def threed2kitti_cfg() -> Config:
    """KITTI data with 3DMatch weights (generalization/ThreeD2KITTI/config.py)."""
    return _gen(threedmatch_cfg(), "KITTI", "data/KITTI", 0.30, 0.03, 0.05,
                40000, False, 0.5, 3.0,
                MatchConfig(dist_th=0.30, inlier_th=2.0, similar_th=0.9,
                            confidence=1.0),
                StaticConfig(points_l0=40960, points_l1=16384, points_l2=6144,
                             raw_points=131072))


def kitti2threed_cfg() -> Config:
    """3DLoMatch data with KITTI weights (generalization/KITTI2ThreeD/config.py:
    keypts_th=0, scale = 0.035/0.30)."""
    c = kitti_cfg()
    return _gen(c, "3DLoMatch", "data/ThreeDMatch", 0.035, 0.30, 0.02,
                30000, True, 0.0, 0.3,
                MatchConfig(dist_th=0.10, inlier_th=1.0 / 3.0, similar_th=0.8,
                            confidence=0.999),
                StaticConfig())


def kitti2eth_cfg() -> Config:
    """ETH data with KITTI weights (generalization/KITTI2ETH/config.py)."""
    c = kitti_cfg()
    return _gen(c, "ETH", "data/ETH", 0.15, 0.30, 0.05,
                30000, False, 0.5, 1.0,
                MatchConfig(dist_th=0.20, inlier_th=2.0, similar_th=0.9,
                            confidence=1.0),
                StaticConfig())


PRESETS = {
    "3DMatch": threedmatch_cfg,
    "3DLoMatch": threedlomatch_cfg,
    "KITTI": kitti_cfg,
    "ThreeD2ETH": threed2eth_cfg,
    "ThreeD2KITTI": threed2kitti_cfg,
    "KITTI2ThreeD": kitti2threed_cfg,
    "KITTI2ETH": kitti2eth_cfg,
}


def make_cfg(name: str = "3DMatch") -> Config:
    """Entry point mirroring the reference's ``make_cfg()``."""
    return PRESETS[name]()


def shrink_static(cfg: Config) -> Config:
    """Swap any preset's static plan for the miniature test plan while
    preserving every data/semantic field (voxel sizes, thresholds, dataset
    layout).  Used by the entry points' ``--tiny`` flag so CI can drive the
    REAL dataset loaders and eval/train plumbing on fixture-sized data."""
    t = tiny_cfg()
    return cfg.replace(
        static=t.static,
        point=replace(cfg.point, num_keypts=t.point.num_keypts),
        match=replace(cfg.match, hypotheses=t.match.hypotheses),
        train=replace(cfg.train, pos_num=t.train.pos_num),
    )


def small_cfg() -> Config:
    """A mid-size static plan for the train-from-scratch quality gate:
    big enough that des_r=0.3 patches are genuinely local (scene extent
    ~0.9 m at 2 cm density -> ~4k sds points), small enough that hundreds
    of train steps run in minutes."""
    c = threedmatch_cfg()
    return c.replace(
        point=replace(c.point, num_keypts=384),
        static=StaticConfig(points_l0=4096, points_l1=2048, points_l2=512,
                            raw_points=16384, max_matches=384,
                            knn_chunk=2048),
        match=replace(c.match, hypotheses=512),
        train=replace(c.train, pos_num=256),
    )


def tiny_cfg() -> Config:
    """A miniature static plan for tests and compile checks."""
    c = threedmatch_cfg()
    return c.replace(
        point=replace(c.point, num_keypts=64),
        # low_match_boost off: tiny clouds sit below low_match_th by
        # construction, and compile-check harnesses (dryrun_multichip on a
        # 1-core virtual mesh) should not pay the second cond branch
        static=StaticConfig(points_l0=512, points_l1=256, points_l2=128,
                            raw_points=1024, neighbor_caps=(16, 16, 16),
                            pool_caps=(16, 16), max_matches=64,
                            normal_knn=8, knn_chunk=256,
                            low_match_boost=False),
        match=replace(c.match, hypotheses=128),
        train=replace(c.train, pos_num=32),
    )
