"""Single frozen configuration for the whole TPU radar-SLAM framework.

The reference scatters tuning constants over module globals (see SURVEY.md §5.6:
`parseData.py:9-14`, `getFeatures.py:13-18,57-63`, `getTransformKLT.py:77-84`,
`outlierRejection.py:10`, `Mapping.py:13-15`, `motionDistortion.py:36`, `FMT.py:10-11`),
with two desynced copies of N_FEATURES_BEFORE_RETRACK (60 vs 80).  Here everything is
one immutable dataclass so jitted functions can close over static values and nothing
recompiles behind your back.

All shapes are static: feature sets are padded to `k_max` with validity masks, blob
candidates to `n_candidates`, map keyframes to `max_keyframes`.  This is the core
TPU-first inversion of the reference's variable-length arrays.
"""

from __future__ import annotations

import dataclasses
import math


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    # ---- sensor geometry (parseData.py:9-14,36; data/full_seq_1/INFO.md) ----
    num_azimuths: int = 400
    num_range_bins: int = 3768          # full bins in the raw PNG (cols 11+)
    range_resolution_m: float = 0.0432  # metres per range bin
    max_range_clip_m: float = 87.5      # paper's clip; 2025 bins
    encoder_size: int = 5600            # azimuth encoder ticks per rev
    scan_frequency_hz: float = 4.0      # Navtech CTS350-X frame rate

    # ---- Cartesian grid (parseData.py:100-135 behaviour, TPU-aligned sizes) ----
    # Default 1024 px at 4 bins/px = 0.1728 m/px — upstream RadarSLAM's cell
    # size, 2x coarser than the reference's 2024^2/0.0864 (parseData.py:10-13);
    # quarters the warp/DoH cost with no measurable ATE impact (tests pin ATE).
    # Set cart_size=2048, cart_downsample=2 for the reference's exact grid.
    cart_downsample: int = 4            # range bins per Cartesian pixel
    cart_size: int = 1024               # cart image is cart_size x cart_size (128-aligned)

    # ---- feature detection: DoH scale space (getFeatures.py:13-18) ----
    doh_sigmas: tuple = (1.0, 5.0, 10.0)  # reference: linspace(0.01,10,3); sigma<1 is a no-op blur
    doh_threshold: float = 5e-4
    n_candidates: int = 1024            # padded candidate blobs before ANMS
    anms_grid: int = 24                 # ANMS cell grid (anms_grid^2 cells)
    anms_top_k: int = 200               # spatially-uniform keypoints kept (getFeatures.py:66)

    # ---- tracked feature set ----
    k_max: int = 256                    # padded tracked-feature capacity
    n_features_before_retrack: int = 80 # refill threshold (paper p.4: 80)
    min_inliers_accept: int = 16        # below this the rigid fit is
    # unconstrained: coast on the constant-velocity prediction instead of
    # accepting the measurement (r05 full-seq finding: single frames with
    # 2-8 inliers produced 8-22 deg heading jumps that re-anchored the
    # keyframe chain and dominated full-sequence ATE; see DRIFT_ANALYSIS.md)

    # ---- KLT tracking (getTransformKLT.py:77-84,343) ----
    klt_window: int = 15                # patch side (odd)
    klt_pyramid_levels: int = 4         # maxLevel=3 => 4 levels
    klt_iters: int = 10
    klt_eps: float = 0.03
    # Mean-abs-patch-residual gate (0..255 scale).  The reference uses 10
    # (getTransformKLT.py:84) and leans on it because its max-clique rejection
    # is exponential-cost; radar speckle puts the *median* honest track at ~10,
    # so that gate throws away half the features.  Our clique peeling is cheap,
    # so we gate loosely here and let geometric consistency do the rejection.
    klt_err_threshold: float = 20.0

    # ---- outlier rejection (outlierRejection.py:10-13) ----
    clique_dist_threshold_m: float = 0.5

    # ---- motion-distortion solver (motionDistortion.py:36-99; RawROAMSystem.py:135-139) ----
    mds_sigma_p: tuple = (4.0, 4.0)                       # px^2 point covariance diag
    mds_sigma_v: tuple = (1.0, 1.0, (5.0 * math.pi / 180.0) ** 2)
    mds_iterations: int = 12            # fixed LM iteration budget (jit-friendly)
    mds_init_lambda: float = 1e-4

    # ---- keyframing (Mapping.py:13-15) ----
    kf_rot_threshold_rad: float = 0.2
    kf_trans_threshold_m: float = 2.0
    max_keyframes: int = 4096           # preallocated map capacity (full_seq_1 scale)

    # ---- FMT rotation estimate (FMT.py:10-11) ----
    fmt_range_clip_m: float = 87.5
    fmt_downsample: int = 10
    use_fmt: bool = False               # reference computes-but-ignores; we gate it

    # ---- pose graph / BA ----
    # 50 LM iterations: converged on a real 447 m loop (2.23 m keyframe ATE,
    # identical cost at 100/200); each iteration is a ~2 ms dense solve on TPU.
    pg_iterations: int = 50
    pg_cg_iterations: int = 0           # CG sweeps per LM step (matrix-free solver);
                                        # 0 = auto (8M: block-Jacobi PCG propagates
                                        # ~1 node/sweep along the odometry chain and
                                        # needs several crossings when robust weights
                                        # are uneven; 2M measurably truncates — see
                                        # posegraph.py)
    pg_sweeps_per_dispatch: int = 4096  # CG sweeps per DEVICE DISPATCH in the
                                        # host-driven PCG solvers: the axon TPU
                                        # faults on over-large single dispatches
                                        # (per-dispatch size/time cliff — the
                                        # r04 full-scale BA crash), so LM
                                        # linearisations and CG sweep slices
                                        # each get their own bounded jit call
    pg_huber_delta: float = 1.0
    pg_gnc_anneal: bool = True          # graduated non-convexity: anneal the Huber
                                        # delta from the largest initial robustified
                                        # edge error down to pg_huber_delta across
                                        # the LM iterations, so large post-hoc loop
                                        # residuals (tens of m of drift) are not
                                        # frozen at ~delta/e weight from step one

    # ---- place recognition (scan-context descriptors; models/placerecog.py) ----
    # The reference stored per-keyframe point clouds intended for M2DP
    # descriptors but never built them (Mapping.py:62, paper "Future work").
    sc_rings: int = 16                  # range rings per descriptor
    sc_sectors: int = 80                # azimuth sectors (must divide num_azimuths)
    sc_max_distance: float = 0.35       # acceptance gate on scan-context distance
    m2dp_max_distance: float = 0.25     # acceptance gate on M2DP cosine distance
    loop_method: str = "both"           # candidates: "pose" | "appearance" | "m2dp" | "both"

    # ---- point cloud per keyframe (getPointCloud.py:28-52; Mapping.py:62) ----
    pc_peaks_per_azimuth: int = 8       # padded peaks kept per azimuth
    pc_points_per_kf: int = 512         # strongest peaks stored per keyframe
                                        # (dense cloud for M2DP, sensor-local m)

    # ---- compute dtypes ----
    image_dtype: str = "float32"        # radar images are low-precision; bf16 optional

    # ------------------------------------------------------------------ derived
    @property
    def clipped_range_bins(self) -> int:
        """Range bins kept after clipping to max_range_clip_m (parseData.py:49-51)."""
        return int(self.max_range_clip_m / self.range_resolution_m)

    @property
    def polar_width_padded(self) -> int:
        """Clipped polar width padded up to a lane multiple (128)."""
        return _round_up(self.clipped_range_bins, 128)

    @property
    def cart_resolution_m(self) -> float:
        """Metres per Cartesian pixel (parseData.py:13)."""
        return self.range_resolution_m * self.cart_downsample

    @property
    def cart_center(self) -> float:
        """Pixel coordinate of the sensor in the Cartesian image (both axes)."""
        return self.cart_size / 2.0

    @property
    def clique_dist_threshold_px(self) -> float:
        return self.clique_dist_threshold_m / self.cart_resolution_m

    @property
    def scan_period_s(self) -> float:
        return 1.0 / self.scan_frequency_hz


DEFAULT_CONFIG = SlamConfig()
