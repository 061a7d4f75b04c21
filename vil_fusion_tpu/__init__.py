"""vil_fusion_tpu — TPU-native visual-inertial-LiDAR SLAM framework.

Top-level conveniences; see README.md and PARITY.md for the layout.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU f32 matmuls default to bf16-input MXU passes; the estimator's normal
# equations, Schur complements and alignment solves (Ceres/GTSAM run f64 in
# the reference) visibly diverge under that: the cold-start BA regression
# converges to 0.012 m at float32 vs 0.125 m at the bf16 default on a v5e
# (measured 2026-08-19). Every matmul in this framework is small (<=
# window*15 ~ 150 dims), so the 3-pass float32 MXU mode costs nothing
# measurable; set it globally rather than leaking precision= through every
# einsum. Override with VIL_FUSION_MATMUL_PRECISION=(default|float32|highest).
_prec = _os.environ.get("VIL_FUSION_MATMUL_PRECISION", "float32")
if _prec != "default":
    _jax.config.update("jax_default_matmul_precision", _prec)

from vil_fusion_tpu.runtime.config import RigConfig, load_rig  # noqa: F401


def make_pipeline(rig_path: str, mode: str = "vil", **kw):
    """Load a rig YAML and build the full pipeline."""
    from vil_fusion_tpu.runtime.pipeline import VILFusionPipeline

    return VILFusionPipeline(load_rig(rig_path), mode=mode, **kw)
