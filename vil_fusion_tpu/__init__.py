"""vil_fusion_tpu — TPU-native visual-inertial-LiDAR SLAM framework.

Top-level conveniences; see README.md and PARITY.md for the layout.
"""

__version__ = "0.1.0"

from vil_fusion_tpu.runtime.config import RigConfig, load_rig  # noqa: F401


def make_pipeline(rig_path: str, mode: str = "vil", **kw):
    """Load a rig YAML and build the full pipeline."""
    from vil_fusion_tpu.runtime.pipeline import VILFusionPipeline

    return VILFusionPipeline(load_rig(rig_path), mode=mode, **kw)
