"""flowgen — TPU-native on-the-fly optical-flow training-data synthesis.

A from-scratch JAX/XLA rebuild of the capabilities of
lmb-freiburg/optical-flow-2d-data-generation ("On-the-Fly-ingChairs"): given a
texture database, emit endless batches of (image0, image1, flow0) — two frames
of a randomly composed 2D scene of textured moving shapes plus the dense
ground-truth forward flow — live at training time, entirely on-device.

Quick start::

    import flowgen

    cfg = flowgen.DataGenConfig(mode=7, batch_size=8, seed=0)
    gen = flowgen.Generator(cfg)           # procedural textures by default
    batch = gen.retrieve_batch()           # {'image0','image1','flow0'}

See SURVEY.md for the architectural mapping to the reference implementation.
"""

from .config import (
    DEFAULT_HEIGHT,
    DEFAULT_WIDTH,
    KIND_COMPOSITE,
    KIND_ELLIPSE,
    KIND_POLYGON,
    MAX_COMPONENTS,
    MAX_OBJECTS,
    MODES,
    DataGenConfig,
    ModeSpec,
    register_mode, disparity_mode,
)
from .compose.render import (
    RenderOutput,
    WarpBank,
    prepare_atlas,
    render_batch,
    render_sample,
)
from .params.blueprint import Background, Objects, Primitives, Scene
from .params.sampler import sample_scene, sample_scene_batch
from .pipeline.generator import (
    Generator,
    generate_batch,
    make_generate_fn,
    make_mixed_generate_fn,
)
from .pipeline.sharding import (
    distribute_atlas,
    texture_paths_for_process,
)
from .texture_io import atlas_for_config, load_texture_db, procedural_atlas

__version__ = "0.1.0"

__all__ = [
    "DataGenConfig",
    "ModeSpec",
    "MODES",
    "register_mode",
    "disparity_mode",
    "distribute_atlas",
    "texture_paths_for_process",
    "Generator",
    "Scene",
    "RenderOutput",
    "WarpBank",
    "generate_batch",
    "make_generate_fn",
    "make_mixed_generate_fn",
    "render_batch",
    "render_sample",
    "sample_scene",
    "sample_scene_batch",
    "atlas_for_config",
    "load_texture_db",
    "prepare_atlas",
    "procedural_atlas",
]
