"""L3 policies / models.

Registry resolves reference model names (gpu_implementation/es.py:144 uses
getattr(models, exp['model']); CPU stack reflects into policies.py via
exp['policy']['type'], es_distributed/es.py:136)."""

from .core import Model, NONLINS, conv2d, dense  # noqa: F401
from .dqn import LargeDQN, LargeDQNXavier, SmallDQN, SmallDQNXavier  # noqa: F401
from .mlp import MLPContext, MujocoMLP, default_context  # noqa: F401
from .simple import ContinuousMLP, LinearClassifier, SimpleClassifier  # noqa: F401

# reference-name aliases
# GPU stack (neuroevolution/models): Model/LargeModel + xavier variants
ModelDQN = SmallDQN
LargeModel = LargeDQN

REGISTRY = {
    # gpu stack names (models/__init__.py of the reference)
    "Model": SmallDQN,
    "LargeModel": LargeDQN,
    "SmallDQN": SmallDQNXavier,
    "LargeDQN": LargeDQNXavier,
    "LinearClassifier": LinearClassifier,
    "SimpleClassifier": SimpleClassifier,
    "ContinuousMLP": ContinuousMLP,
    # cpu stack policy names (es_distributed/policies.py)
    "MujocoPolicy": MujocoMLP,
    "GAAtariPolicy": SmallDQN,
    # ESAtariPolicy (virtual batch norm) registered by models.batchnorm import
}


def get_model(name: str):
    from . import batchnorm  # late import avoids cycle; registers VBN models

    REGISTRY.setdefault("ESAtariPolicy", batchnorm.VirtualBNDQN)
    REGISTRY.setdefault("ModelVirtualBN", batchnorm.VirtualBNDQN)
    REGISTRY.setdefault("ModelBN", batchnorm.BNDQN)
    # actual class names too: policy snapshots record type(model).__name__
    # (utils/checkpoint.py save_policy_snapshot), so replay must resolve them
    REGISTRY.setdefault("VirtualBNDQN", batchnorm.VirtualBNDQN)
    REGISTRY.setdefault("BNDQN", batchnorm.BNDQN)
    REGISTRY.setdefault("SmallDQNXavier", SmallDQNXavier)
    REGISTRY.setdefault("LargeDQNXavier", LargeDQNXavier)
    return REGISTRY[name]
