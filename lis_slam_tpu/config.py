"""Typed configuration for the TPU-native SLAM engine.

One dataclass tree replaces the reference's three config layers:
 - rosparam YAML presets (`config/params.yaml`, `params_lio/cqu/m2.yaml`)
   loaded by `ParamServer` (reference src/include/utility.h:361-480),
 - semantic label YAML (`config/label.yaml`) loaded by `SemanticLabelParam`
   (utility.h:122-229) — see lis_slam_tpu/labels.py,
 - the reference's compile-time strategy #defines
   (odomEstimationNode.cpp:8-11, subMapOptmizationNode.cpp:29-35) which here
   are runtime fields (`target_mode`, `feature_mode`).

Everything that shapes arrays (capacities, scan geometry) is static so XLA
sees fixed shapes; everything numeric rides into jitted functions as Python
floats baked into the trace.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from enum import Enum


class TargetMode(str, Enum):
    """Which map the current scan is matched against (reference compile-time
    flags USING_SINGLE/SUBMAP/SLIDING/MULTI_KEYFRAME_TARGET)."""

    SINGLE_FRAME = "single_frame"
    MULTI_FRAME = "multi_frame"  # last K keyframes merged (front-end default)
    SLIDING = "sliding"  # sliding local map, bbox-cropped (back-end default)
    SUBMAP = "submap"


class FeatureMode(str, Enum):
    """USING_LOAM_FEATURE vs USING_SEMANTIC_FEATURE (subMapOptmizationNode.cpp:34-35)."""

    LOAM = "loam"
    SEMANTIC = "semantic"


class DescriptorType(str, Enum):
    """Loop-closure descriptor family (params.yaml Using*Flag block)."""

    SC = "sc"
    ISC = "isc"
    EPSC = "epsc"
    SEPSC = "sepsc"
    SSC = "ssc"
    FEPSC = "fepsc"
    POSE = "pose"


@dataclass(frozen=True)
class SensorConfig:
    """Sensor geometry (params.yaml "Sensor Settings")."""

    n_scan: int = 64
    horizon_scan: int = 1800
    downsample_rate: int = 2
    lidar_min_range: float = 0.0
    lidar_max_range: float = 70.0
    scan_period: float = 0.1  # seconds per sweep (laserPretreatment.h:12)
    # Raw-cloud fixed capacity (HDL-64 emits ~130k points/scan)
    max_raw_points: int = 150_000


@dataclass(frozen=True)
class ImuConfig:
    """IMU noise + extrinsics (params.yaml "IMU Settings")."""

    use_imu: bool = False
    # deskew source: "gyro" (laserProcessing IMU path, needs use_imu),
    # "velocity" (dataPretreat alternate front-end: constant-velocity
    # compensation from an ego-velocity stream, dataPretreatNode.cpp:184-253)
    deskew_mode: str = "gyro"
    acc_noise: float = 3.9939570888238808e-03
    gyr_noise: float = 1.5636343949698187e-03
    acc_bias_noise: float = 6.4356659353532566e-05
    gyr_bias_noise: float = 3.5640318696367613e-05
    gravity: float = 9.80511
    rpy_weight: float = 0.1
    # --- noise model for the covariance-weighted bias/velocity MAP update
    # (velocity_bias_update/2) — the counterpart of the reference's gtsam
    # noise models (subMapOptmizationNode.cpp:380-387): the lidar pose
    # anchors play correctionNoise's role (per-axis sigmas of the scan-to-
    # map pose; the reference's isotropic sigma=1 is deliberately loose for
    # robustness, these reflect the solver's actual accuracy), the bias
    # prior plays priorBiasNoise's role, the velocity prior priorVelNoise's
    # (1e4 there — effectively free; v is observable from two windows). ---
    pose_anchor_rot_sigma: float = 0.01  # rad
    pose_anchor_pos_sigma: float = 0.02  # m
    # initial [bg, ba] marginal sigma: an uncalibrated MEMS accel bias is
    # O(0.1 m/s^2), so the prior must not shrink a real bias away
    bias_prior_sigma: float = 0.1
    v0_prior_sigma: float = 10.0  # m/s
    # extrinsic rotation IMU->lidar (KITTI values from params.yaml)
    extrinsic_rot: tuple = (
        (9.999976e-01, 7.553071e-04, -2.035826e-03),
        (-7.854027e-04, 9.998898e-01, -1.482298e-02),
        (2.024406e-03, 1.482454e-02, 9.998881e-01),
    )
    extrinsic_trans: tuple = (-8.086759e-01, 3.195559e-01, -7.997231e-01)
    # orientation remap matrix (extrinsicRPY, utility.h:500-508; the
    # reference's params set it equal to extrinsicRot for these sensors)
    extrinsic_rpy: tuple = (
        (9.999976e-01, 7.553071e-04, -2.035826e-03),
        (-7.854027e-04, 9.998898e-01, -1.482298e-02),
        (2.024406e-03, 1.482454e-02, 9.998881e-01),
    )
    # fixed-capacity IMU window per scan (200 Hz * 0.1 s + margin)
    max_imu_per_scan: int = 64


@dataclass(frozen=True)
class FeatureConfig:
    """LOAM feature extraction (params.yaml "LOAM feature threshold" +
    constants from laserProcessing.cpp extractFeatures)."""

    edge_threshold: float = 1.0
    surf_threshold: float = 0.1
    edge_feature_min_valid_num: int = -1
    surf_feature_min_valid_num: int = 100
    sectors_per_ring: int = 6
    max_corners_per_sector: int = 20
    max_sharp_corners_per_sector: int = 4
    max_sharp_surfs_per_sector: int = 10
    occlusion_range_diff: float = 0.3
    occlusion_col_diff: int = 10
    parallel_beam_ratio: float = 0.02
    # reference-faithful greedy pick-and-suppress selection (slow on TPU;
    # the vectorized local-extremum selection is the production default)
    greedy_selection: bool = False
    # fixed capacities for padded feature buffers (per scan)
    max_corner_points: int = 4096
    max_surf_points: int = 32768
    max_sharp_corner_points: int = 1024
    max_sharp_surf_points: int = 2048


@dataclass(frozen=True)
class MatchingConfig:
    """Scan-to-map matching / solver (odomEstimationNode.cpp:596-974)."""

    max_iterations_frontend: int = 15
    max_iterations_submap: int = 20
    max_iterations_submap2submap: int = 30
    nn_max_sq_dist: float = 1.0  # 5th-NN gate (pointSearchSqDis[4] < 1.0)
    plane_fit_tolerance: float = 0.2
    eigen_ratio_line: float = 3.0  # matD1(0,0) > 3*matD1(0,1)
    residual_damping: float = 0.9  # s = 1 - 0.9*|residual|
    min_residual_weight: float = 0.1  # keep if s > 0.1
    min_valid_points: int = 50
    degeneracy_eigen_threshold: float = 100.0
    converge_delta_r_deg: float = 0.005
    converge_delta_t_cm: float = 0.05
    # cond-free solver schedule for vmapped multi-sequence replay
    # (scan_to_map_scheduled): static iteration count + kNN refresh points.
    # Each refresh is a full kNN search (~2.1 ms/lane at batch 8); swept on
    # the 8-lane HDL-64 circuit, one mid-schedule refresh matches the
    # (2,5) double refresh to ATE noise (0.0335 vs 0.0339) at +14%
    # throughput (scripts/sweep_batched.py).
    uniform_iters: int = 8
    uniform_refresh: tuple = (3,)
    # matched-cloud source: "hybrid" (production default: sharp corners +
    # voxel-UNIFORM downsample of the FULL surf cloud — measured on the
    # 60-scan TPU circuit it is both FASTER and 2.7x more accurate than
    # "sharp" at surf capacity 2048: 103.3 vs 95.2 scans/s, ATE 0.044 vs
    # 0.119; the uniform spatial coverage converges in fewer GN iterations,
    # see docs/PERF.md round 4), "sharp" (the extracted sharp feature
    # clouds only), or "full_ds" (reference-faithful: voxel-DS of the FULL
    # corner/surf clouds — currentCloudInit, odomEstimationNode.cpp:
    # 260-281 downsamples the full clouds, NOT the sharp subsets)
    match_source: str = "hybrid"
    matched_corner_capacity: int = 4096
    matched_surf_capacity: int = 2048
    # full_ds leaf sizes. The reference uses the mapping leaves (0.2/0.4);
    # measured on the synthetic circuit, the accuracy gain comes from the
    # VOXEL-UNIFORM coverage, not the point count — surf leaf 1.2 m keeps
    # nearly all of it (ATE 0.051 vs 0.044 at 0.4 m) at 1.5x the speed
    # (docs/PERF.md round-2 notes).
    matched_corner_leaf: float = 0.2
    matched_surf_leaf: float = 1.2
    # map buffer capacities (multi-frame target, voxel-downsampled).
    # Sized ~2x the occupancy observed on dense urban synthetic replay
    # (surf ~29k, corner ~3k voxels over the 20-keyframe window).
    corner_map_capacity: int = 16384
    surf_map_capacity: int = 65536
    # voxel-hash NN parameters
    hash_table_slots: int = 1 << 15
    hash_bucket_size: int = 16
    # scan_to_map neighbor-cache size (candidates fetched per query by the
    # Pallas kNN and re-ranked each GN iteration) and the pose-drift
    # thresholds that trigger a fresh search. The kernel's per-tile cost is
    # k sequential extraction passes, so cache_k is a direct speed lever;
    # 8 keeps a 3-candidate margin over the 5 consumed (measured
    # ATE-neutral on the 60-scan circuit, ~7% step speedup vs 10).
    nn_cache_k: int = 8
    nn_cache_refresh_dist: float = 0.3
    nn_cache_refresh_rot: float = 0.05
    # back-end degenerate-solve ICP fallback (icpAlignment,
    # subMapOptmizationNode.cpp:1435-1507)
    icp_fallback: bool = True
    # GN iteration backend: "xla" (op-by-op: top_k re-rank, gathers,
    # batched closed-form fits) or "pallas" (ops/pallas_gn.py: the whole
    # iteration body fused into one VMEM-resident kernel per cloud —
    # re-rank, eigen/plane fits, and the J^T J reduction; the (Q, 5, 3)
    # intermediates never touch HBM). Same math to f32 rounding
    # (tests/test_pallas_gn.py). The vmapped batched-replay path always
    # uses "xla" (a Pallas call cannot batch under vmap).
    gn_backend: str = "xla"


@dataclass(frozen=True)
class VoxelConfig:
    """Voxel filter leaf sizes (params.yaml "voxel filter paprams")."""

    odometry_surf_leaf: float = 0.4
    mapping_corner_leaf: float = 0.2
    mapping_surf_leaf: float = 0.4
    submap_corner_leaf: float = 0.2
    submap_surf_leaf: float = 0.4
    submap_leaf: float = 0.5
    # what a re-observed map voxel keeps (ops/voxel.voxel_merge_aged):
    # "first" anchors the first observation's position (KISS-ICP/VDB rule;
    # measured sharp ATE 0.144 -> 0.027 on the clean HDL-64 circuit);
    # "newest" refreshes the position on re-observation (closer to the
    # reference's rebuild-from-keyframe-clouds, wins when scans carry
    # residual distortion — see the velocity front-end test)
    map_anchor: str = "first"


@dataclass(frozen=True)
class KeyframeConfig:
    """Keyframe gating + multi-frame target window
    (odomEstimationNode.cpp:216-228, 452-467; params.yaml)."""

    min_distance: float = 1.4  # keyFrameMiniDistance
    min_yaw: float = 0.5  # keyFrameMiniYaw (radians)
    window_size: int = 20  # last-K keyframe clouds merged as target
    converge_delta_r: float = 0.005
    converge_delta_t: float = 0.05
    # reference-parity convergence precondition on the gate
    # (odomEstimationNode.cpp:216-228 requires the solver converged before
    # a keyframe may be saved); switchable for ablation
    require_convergence: bool = True
    # unconditional keyframes while kf_count <= bootstrap_frames. The
    # reference uses 5 (odomEstimationNode.cpp:219 `keyFrameId <= 5`) to
    # densify its rebuilt-from-scratch local map quickly; our incremental
    # first-observation-anchored voxel map does not need the bootstrap, and
    # inserting keyframes before the solver has a dense target measurably
    # hurts (12-scan circuit: sharp ATE 0.038 -> 0.027, full_ds
    # 0.060 -> 0.041 going 5 -> 0). Set 5 for exact reference behavior.
    bootstrap_frames: int = 0


@dataclass(frozen=True)
class SubMapConfig:
    """Submap cut criterion + capacities (subMap.h:1103-1122, params.yaml)."""

    yaw_max: float = 0.9
    translation_max: float = 50.0
    frames_size: int = 20
    # subMapMaxTime / subMapOptmizationFirstSize: loaded by the reference's
    # ParamServer (utility.h:459,467) but consumed by no code — its cut
    # criterion is translation/yaw/frames only (judge_new_submap,
    # subMap.h:1103-1122), which judge_new_submap here reproduces. Kept for
    # preset parity.
    max_time: float = 3.0
    first_size: int = 2
    max_submaps: int = 256  # global pose-graph capacity
    local_map_radius: float = 70.0  # sliding-target bbox crop (+-70 m)
    # per-submap merged cloud capacities
    corner_capacity: int = 65536
    surf_capacity: int = 131072
    # sliding semantic LOCAL map capacities (localMap_t window, NOT the
    # merged submap clouds — round 2 sized the sliding map off the submap
    # capacities above, which made every keyframe's aged-voxel merge sort
    # ~160k rows; the window holds the same content as the front-end's
    # 20-keyframe map, so the front-end capacities are the right scale)
    local_corner_capacity: int = 16384
    local_surf_capacity: int = 65536
    # matched-cloud capacities for the stage-1 semantic refinement: the
    # reference matches the per-class VOXEL-DOWNSAMPLED keyframe clouds
    # (keyframeInit's *DS clouds, subMapOptmizationNode.cpp:807-821 ->
    # currentCloudInit :856-893), not the raw compactions
    matched_corner_capacity: int = 4096
    matched_surf_capacity: int = 8192
    # leaf for the refine's MATCHED surf cloud only (the per-class keyframe
    # clouds — the map product — keep voxel.submap_surf_leaf). 0.8 m keeps
    # ~3.3k voxel-uniform surf matches (vs 7.7k at 0.4) at -25% refine time
    # with no measurable ATE change on the synthetic circuit; 1.2 m starves
    # the solver into the degenerate-ICP fallback.
    refine_surf_leaf: float = 0.8
    # per-category clouds: keyframe_t carries 5 semantic class clouds
    # (subMap.h:237-428) and submap_t merges them (:435-664)
    keyframe_class_capacity: int = 8192
    class_capacity: int = 32768
    # dynamic-removal gates (subMap.h:1065-1100)
    dynamic_removal_radius: float = 30.0
    dynamic_near: float = 0.1
    dynamic_min: float = 1.0
    dynamic_max: float = 10.0
    # --- submap-to-submap registration consumption (pipeline/slam.py) ---
    # bbox-intersection crop margin around min/max overlap, metres: the
    # reference crops both clouds to the raw intersection
    # (extractSubMapCloud, subMapOptmizationNode.cpp:3976-4081); the margin
    # keeps boundary structure that would otherwise lose its neighbors
    bbox_margin_m: float = 2.0
    # reject a refined submap transform whose translation jumps further
    # than this from the odometry chain (falls back to the odometry
    # factor) — plays the role of the reference's iSAM2 robustness to a
    # diverged scan-to-map solve; sized ~4x the worst inter-submap
    # odometry drift observed on the synthetic circuits
    register_jump_reject_m: float = 2.0
    # --- keyframe device-cloud retention (endurance policy; the reference
    # evicts its map containers aggressively, odomEstimationNode.cpp:
    # 591-593) --- keyframe corner/surf/class clouds are only read (a) by
    # the submap merge at close and (b) as the SOURCE of a loop ICP
    # verification, which always targets a RECENT keyframe (dispatched
    # within ~2 drain cycles of its creation). Once a keyframe's submap is
    # `release_after_submaps` closes old, its device clouds are freed —
    # poses/descriptors/timestamps stay. 0 disables eviction.
    release_after_submaps: int = 2


@dataclass(frozen=True)
class LoopClosureConfig:
    """EPSC loop closure (epscGeneration.h + params.yaml "Loop closure")."""

    enabled: bool = True
    descriptor: DescriptorType = DescriptorType.FEPSC
    # loopClosureFrequency: the reference paces its loop THREAD at this
    # wall rate (ros::Rate, subMapOptmizationNode.cpp:2330) while keyframes
    # queue up; every keyframe is still processed eventually. Here loop
    # work is dispatched asynchronously per keyframe and consumed a drain
    # cycle later — same latency structure, no wall pacing needed.
    frequency: float = 2.0
    rings: int = 20
    sectors: int = 80
    min_dis: float = 3.0
    max_dis: float = 60.0
    lidar_height: float = 5.0
    skip_neighbor_distance: float = 20.0  # SKIP_NEIBOUR_DISTANCE
    inflation_covariance: float = 0.01  # INFLATION_COVARIANCE
    # GEOMETRY/INTENSITY_THRESHOLD (epscGeneration.h:14-15): the reference
    # consults these only in its offline loopDetectionTest harness
    # (epscGeneration.cpp:1232,1248); the LIVE loopDetection path gates
    # every descriptor family on DISTANCE_THRESHOLD (:779-860), which is
    # what distance_threshold reproduces. Kept for preset parity.
    geometry_threshold: float = 0.15
    intensity_threshold: float = 0.79
    distance_threshold: float = 0.75
    label_threshold: float = 0.79
    rotation_search: int = 10  # +-10 sector shift in calculateDistance
    # historyKeyframeSearch{Radius,TimeDiff}: loaded by the reference's
    # ParamServer but consumed by no live code path (its kd-tree candidate
    # search variant is commented out); the travel/inflation gate above is
    # the live candidate gate. Kept for preset parity.
    history_search_radius: float = 15.0
    history_search_time_diff: float = 30.0
    history_fitness_score: float = 0.5
    max_candidates: int = 8
    icp_max_iterations: int = 30
    max_keyframes: int = 4096  # descriptor database capacity
    # --- loop ICP verification (detectLoopClosureForSubMap,
    # subMapOptmizationNode.cpp:2739-2916) --- the reference registers with
    # max correspondence distance 10 m (:2765); 2 m measured equally
    # reliable on the descriptor-seeded verifies here (the seed is already
    # within ~1 m) and 5x cheaper in rejected-pair cost
    verify_max_correspond_dist: float = 2.0
    # voxel-hash build for the verify target cloud (ops/knn.build_hash):
    # 1 m cells / 32k slots cover a 131k-point submap surf cloud at <50%
    # load factor
    verify_hash_cell_size: float = 1.0
    verify_hash_table_size: int = 1 << 15
    # verify-ICP cloud compaction: the reference registers the keyframe's
    # and submap's voxel-DOWNSAMPLED class clouds (subMap.h:269-277 `_down`
    # variants, merged at :2746-2750 / :2838-2842), not the raw merges.
    # Compacting the capacity-padded buffers (8k source / 5x32k target
    # slots) to these capacities took one verify dispatch from 433 ms to
    # ~35 ms on-device (docs/PERF.md round 5) — the difference between a
    # multi-lap replay stalling on its own loop closures and not.
    verify_source_leaf: float = 0.8
    verify_source_capacity: int = 4096
    verify_target_leaf: float = 0.5
    verify_target_capacity: int = 32768
    # kNN refresh schedule inside the verify ICP (ops/icp.py refresh_iters):
    # full hash searches at these iterations, cached neighbor indices
    # re-evaluated at the current pose in between. The reference re-matches
    # every PCL iteration on a CPU worker thread that never blocks the
    # 10 Hz path (:2328-2492); here the verify shares the ONE device stream
    # with odometry, so its cost directly gates full-system throughput.
    verify_refresh_iters: tuple = (0, 4, 10, 18)


@dataclass(frozen=True)
class GraphConfig:
    """Global pose-graph solver (replaces GTSAM iSAM2,
    subMapOptmizationNode.cpp:4084-4385)."""

    max_iterations: int = 60  # LM sweeps; graph is tiny, sweeps are cheap
    odom_rot_sigma: float = 1e-3
    odom_trans_sigma: float = 1e-2
    loop_rot_sigma: float = 1e-2
    loop_trans_sigma: float = 1e-1
    prior_sigma: float = 1e-4
    damping: float = 1e-6
    gps_cov_threshold: float = 2.0
    # params.yaml poseCovThreshold, kept for preset parity. The reference
    # SKIPS GPS factors while the iSAM2 marginal x/y variance of the latest
    # pose is below this (addGPSFactor, subMapOptmizationNode.cpp:4230-4243)
    # — a guard against GPS jitter dragging a confident graph. This rebuild
    # deliberately always consumes covariance-gated fixes instead: priors
    # are information-weighted by the fix covariance and the LM solver is
    # monotone (plus robust loop kernels), so a confident graph simply
    # outweighs a noisy fix — the failure mode the reference gates against
    # cannot occur. Deviation covered by test_gps_priors_reduce_drift_*.
    pose_cov_threshold: float = 25.0
    # inner linear solver: "dense" (exact (6N)^3 factorization, best at
    # reference scale), "cg" (matrix-free block-Jacobi PCG, O(E) per
    # sweep — the city-scale path), or "auto" (dense up to
    # dense_max_nodes padded nodes, then cg)
    solver: str = "auto"
    dense_max_nodes: int = 256
    cg_iters: int = 96
    # GNC-Cauchy robust kernel on LOOP edges (odometry stays quadratic):
    # a false loop surviving the ICP fitness gate must not corrupt the
    # graph. The kernel scale starts at gnc_start_c (effectively quadratic,
    # so drifted-but-true loops still pull) and halves per LM sweep down to
    # robust_c whitened sigmas (graduated non-convexity).
    robust_loops: bool = True
    robust_c: float = 3.0
    gnc_start_c: float = 1e3


@dataclass(frozen=True)
class SemanticConfig:
    """RangeNet++ + category mapping (semanticFusionNode.cpp:173-189)."""

    enabled: bool = False
    num_classes: int = 20
    model_input_h: int = 64
    model_input_w: int = 2048
    model_input_c: int = 5
    # per-channel normalization means/stds (RangeNet++ darknet53 arch_cfg)
    img_means: tuple = (12.12, 10.88, 0.23, -1.04, 0.21)
    img_stds: tuple = (12.32, 11.47, 6.91, 0.86, 0.16)
    fp16: bool = True  # bf16 on TPU
    # architecture scaling: defaults = the released darknet53 backbone-OS32
    # (arch_cfg.yaml); the slim preset (see SLIM_SEMANTIC) is what the
    # in-repo synthetic-world checkpoint uses (~1.7M params, committable)
    enc_blocks: tuple = (1, 2, 8, 8, 4)
    enc_widths: tuple = (64, 128, 256, 512, 1024)
    dec_widths: tuple = (512, 256, 128, 64, 32)


@dataclass(frozen=True)
class RuntimeConfig:
    """Host-side runtime: queues, replay, export (aux subsystems)."""

    queue_capacity: int = 20  # drop-beyond-20 policy (subMapOptmizationNode.cpp:739)
    # deferred-pipeline drain batch: per-scan results are fetched from the
    # device in batches of this many scans with ONE blocking transfer
    # (pipeline/slam.py). 1 = near-synchronous; larger amortizes the ~25 ms
    # D2H sync of tunneled TPUs at the cost of keyframe bookkeeping lag.
    # Swept on the loop-closing plaza (scripts/sweep_drain.py): 6 -> 34.4,
    # 12 -> 38.0, 25 -> 38.7 scans/s with IDENTICAL trajectories/loops; 12
    # keeps the bookkeeping lag at 1.2 s (the reference's loop thread runs
    # at 2 Hz = 0.5 s, its optimizer at 1 Hz).
    #
    # FAILURE-RESET LATENCY: the sticky device-side IMU failure latch is
    # consumed when its window's scalars are read back, which since round
    # 5 is one window DELAYED — a diverged nav state can seed GN initial
    # guesses for up to 2*drain_every scans before _imu_reset fires (the
    # reference resets in the same callback, subMapOptmizationNode.cpp:
    # 2153-2156). Mitigations already in place: the predicted guess only
    # ARMS init_guess_valid (the solver still converges from the
    # constant-velocity cascade on garbage guesses), and the latch is
    # sticky so no divergence event is dropped. Lower drain_every if IMU
    # divergence is expected to be frequent.
    drain_every: int = 12
    # batched multi-sequence replay (parallel/batched.replay_batched):
    # keyframe-merge cadence. Lanes diverge under vmap, so the cond-free
    # step pays the masked aged-voxel merge EVERY scan — ~47% of the
    # per-lane cost (docs/PERF.md round 4). With K>1 only every Kth step
    # compiles the merge in; a keyframe the gate wanted in between fires at
    # the next allowed step (quantized timing, identical map semantics).
    # 1 = exact single-sequence uniform-step behavior. Swept on the 8-lane
    # HDL-64 circuit (scripts/sweep_batched.py): K=1 50.7, K=2 58.1,
    # K=3 63.2, K=4 65.6 agg scans/s at statistically flat ATE
    # (0.036/0.036/0.032/0.034).
    batched_kf_every: int = 4
    # mappingProcessInterval: loaded by the reference's ParamServer but
    # consumed by no code (params.yaml:128 comment notwithstanding). Kept
    # for preset parity.
    mapping_process_interval: float = 0.15
    z_tolerance: float = 1000.0
    rotation_tolerance: float = 1000.0
    save_pcd: bool = False
    save_trajectory: bool = False
    result_path: str = ""
    num_host_threads: int = 2


@dataclass(frozen=True)
class SlamConfig:
    sensor: SensorConfig = field(default_factory=SensorConfig)
    imu: ImuConfig = field(default_factory=ImuConfig)
    feature: FeatureConfig = field(default_factory=FeatureConfig)
    matching: MatchingConfig = field(default_factory=MatchingConfig)
    voxel: VoxelConfig = field(default_factory=VoxelConfig)
    keyframe: KeyframeConfig = field(default_factory=KeyframeConfig)
    submap: SubMapConfig = field(default_factory=SubMapConfig)
    loop: LoopClosureConfig = field(default_factory=LoopClosureConfig)
    graph: GraphConfig = field(default_factory=GraphConfig)
    semantic: SemanticConfig = field(default_factory=SemanticConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    target_mode: TargetMode = TargetMode.MULTI_FRAME
    feature_mode: FeatureMode = FeatureMode.LOAM

    def replace(self, **kw) -> "SlamConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Presets mirroring the reference's four YAML files
# ---------------------------------------------------------------------------


def kitti_config() -> SlamConfig:
    """KITTI HDL-64, LiDAR-only, FEPSC loop closure (config/params.yaml)."""
    return SlamConfig()


def lio_config() -> SlamConfig:
    """VLP-16 + IMU + GPS-vel, EPSC (config/params_lio.yaml)."""
    base = SlamConfig()
    return base.replace(
        sensor=SensorConfig(
            n_scan=16, horizon_scan=1800, downsample_rate=1,
            lidar_min_range=1.0, lidar_max_range=100.0, max_raw_points=40_000,
        ),
        imu=dataclasses.replace(base.imu, use_imu=True),
        loop=dataclasses.replace(base.loop, descriptor=DescriptorType.EPSC),
        keyframe=dataclasses.replace(base.keyframe, min_distance=0.2, min_yaw=0.2),
    )


def cqu_config() -> SlamConfig:
    """RSLidar-16 preset (config/params_cqu.yaml)."""
    base = lio_config()
    return base.replace(
        sensor=dataclasses.replace(base.sensor, lidar_max_range=80.0),
    )


def m2_config() -> SlamConfig:
    """32-beam preset with trajectory export (config/params_m2.yaml)."""
    base = SlamConfig()
    return base.replace(
        sensor=SensorConfig(
            n_scan=32, horizon_scan=1800, downsample_rate=1,
            lidar_min_range=1.0, lidar_max_range=90.0, max_raw_points=80_000,
        ),
        runtime=dataclasses.replace(base.runtime, save_trajectory=True),
    )


def slim_semantic_config() -> SemanticConfig:
    """Reduced RangeNet for the in-repo synthetic-world checkpoint:
    same OS-32 encoder/decoder topology, ~1/30 the parameters."""
    return SemanticConfig(
        enabled=True,
        enc_blocks=(1, 1, 2, 2, 2),
        enc_widths=(16, 32, 64, 96, 128),
        dec_widths=(96, 64, 48, 32, 24),
    )


PRESETS = {
    "kitti": kitti_config,
    "lio": lio_config,
    "cqu": cqu_config,
    "m2": m2_config,
}
