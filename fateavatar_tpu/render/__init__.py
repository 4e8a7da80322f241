from fateavatar_tpu.render.splats import Gaussians  # noqa: F401
from fateavatar_tpu.render.render import render, RenderConfig  # noqa: F401
