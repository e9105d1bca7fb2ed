"""torch.hub entry-point mapping (reference /root/reference/hubconf.py).

torch.hub is a torch-weights distribution channel; this build's equivalent
surface is :func:`fbk_fairseq_st_tpu.hub_utils.from_pretrained`, which loads
either a native checkpoint or a fork ``.pt`` (converted on the fly) and
returns a ready generator interface. Registered model names are exposed as
hub-style callables so ``torch.hub.load(<this repo>, '<model>', ...)``-shaped
code keeps working without torch-format weights on the JAX side.
"""

from fbk_fairseq_st_tpu import hub_utils  # noqa: F401
from fbk_fairseq_st_tpu.registry import MODELS

dependencies = [
    "jax",
    "numpy",
]


def _make_loader(model_name):
    def loader(*args, **kwargs):
        return hub_utils.from_pretrained(*args, **kwargs)

    loader.__name__ = model_name
    loader.__doc__ = (
        f"Load a pretrained '{model_name}' via hub_utils.from_pretrained"
    )
    return loader


for _model_type in MODELS.keys():
    _name = _model_type.replace(".", "_")
    if _name not in globals():
        globals()[_name] = _make_loader(_name)
