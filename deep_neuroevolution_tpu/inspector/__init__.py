"""VINE visual inspector — BC-cloud loading, dimensionality reduction,
static rendering, and the interactive linked-figure GUI over the
per-generation snapshot dumps (utils/vine.py).

Reference: visual_inspector/ (~1.5k LoC matplotlib GUI). The data layer
(load_data), the hi-dim reduction pipeline (process_bc.py + dimen_red/),
static multi-generation renderings (plot), and the full interactive GUI
(interactive: linked cloud + fitness figures, fitness-binned color ramps,
generation navigation with visible-range caps, cloud modes, movie playback,
hover/pick annotations, and right-click rollout replay of any point via the
stored noise index + policy seed — figure_base/ + figure_custom/) are all
reproduced. Replays run through the framework's device replay path
(inspector/replay.py + utils/viz.py).

GUI entry point: `python -m deep_neuroevolution_tpu.inspector.interactive
START END SNAPSHOTS_PATH...` (main_mujoco.py/main_atari.py analog).
"""

from .load_data import list_generations, load_offspring, load_parent  # noqa: F401
from .reduce import assemble, disassemble, reduce_dim  # noqa: F401
from .plot import plot_cloud_series  # noqa: F401
from .interactive import Inspector  # noqa: F401
