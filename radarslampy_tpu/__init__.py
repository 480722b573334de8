"""radarslampy_tpu — a TPU-native radar SLAM framework (JAX/XLA/Pallas/pjit).

Brand-new implementation of the full RAW-ROAM capability surface
(Samleo8/RadarSLAMPy; see SURVEY.md for the structural analysis), redesigned
TPU-first: fixed-shape masked tensor pipelines, one fused jitted step per radar
frame, and a sharded map/pose-graph back-end that scales over device meshes
with XLA collectives.

Public API:
    SlamConfig                       — the single frozen configuration
    RadarSlamSystem                  — end-to-end driver (Oxford sequences)
    frontend.init_state / slam_step  — the fused per-frame device pipeline
    posegraph.optimize_pose_graph    — dense SE(2) pose-graph LM
    parallel.*                       — mesh/sharded back-end
"""

from radarslampy_tpu.config import DEFAULT_CONFIG, SlamConfig
from radarslampy_tpu.models.system import RadarSlamSystem, RunResult

__all__ = ["SlamConfig", "DEFAULT_CONFIG", "RadarSlamSystem", "RunResult"]
__version__ = "0.1.0"
