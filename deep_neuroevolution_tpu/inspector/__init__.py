"""VINE visual inspector — BC-cloud loading, dimensionality reduction, and
plotting over the per-generation snapshot dumps (utils/vine.py).

Reference: visual_inspector/ (~1.5k LoC matplotlib GUI). The data layer
(load_data), the hi-dim reduction pipeline (process_bc.py + dimen_red/), and
cloud/fitness visualization are reproduced; the interactive linked-figure
GUI is replaced by static multi-generation renderings plus a matplotlib
`show()` mode when a display exists (this framework targets headless TPU
hosts). Rollout replay of any cloud point is available through the stored
per-rollout policy seed + `utils.viz` (the deterministic-replay mechanism of
figure_custom/rollout_custom.py).
"""

from .load_data import list_generations, load_offspring, load_parent  # noqa: F401
from .reduce import assemble, disassemble, reduce_dim  # noqa: F401
from .plot import plot_cloud_series  # noqa: F401
