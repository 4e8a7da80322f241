"""Family adapters: plug any registered avatar family into the rich Trainer.

The reference drives all five model families through ONE trainer
(train/trainer.py:79-101 keeps per-model hook dicts for step / visualize /
checkpoint). Here the same role is a small adapter record built from
train/registry.py entries, so `Trainer` gets epochs, prefetch, meters,
eval videos/metrics, checkpoints and snapshots for every family — not just
FateAvatar.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax


@dataclass
class FamilyAdapter:
    """What the Trainer needs from a model family.

    step:       (train_state, Frame) -> (train_state, aux dict); aux must
                contain "loss", may contain "psnr" / "overflow".
    init_ts:    (seed) -> train state pytree.
    forward:    (params, state, expr, pose, camera, bg) -> model out dict
                with at least "rgb_image" (used by eval / fps / tracking).
    visualize:  optional (params, state, expr, pose, camera) -> dict with
                rgb_image / cano_image / grad_image / point_image / verts
                (FateAvatar's multi-panel snapshot); None -> pred/gt/heat.
    epoch_hook: optional (trainer, epoch) -> None, run after each epoch
                (MonoGaussianAvatar's prune/upsample schedule).
    """

    name: str
    step: Callable
    init_ts: Callable[[int], Any]
    forward: Callable
    visualize: Optional[Callable] = None
    epoch_hook: Optional[Callable] = None


def make_family_adapter(
    name: str, bundle, loss_fn, optimizer, render_cfg, training_cfg: dict,
) -> FamilyAdapter:
    """Build the adapter for a registry family from its builders' outputs.

    ``bundle`` is whatever ``registry.get(name).build_model`` returned.
    """
    from fateavatar_tpu.train import baseline_steps as BS
    from fateavatar_tpu.train import registry

    entry = registry.get(name)
    step = entry.build_step(bundle, loss_fn, optimizer, render_cfg,
                            training_cfg)
    model = bundle[0]
    params0 = bundle[1]
    state0 = bundle[2] if len(bundle) > 2 and not callable(bundle[2]) else None

    if name == "fateavatar":
        raise ValueError(
            "fateavatar uses the Trainer's built-in default adapter"
        )

    def init_ts(seed: int = 0):
        return BS._init_ts(params0, state0, optimizer, seed=seed)

    if name == "gaussianavatars":
        from fateavatar_tpu.models.baselines import gaussianavatars as GA

        def forward(params, state, expr, pose, camera, bg):
            return GA.ga_forward(model, params, state, expr, pose, camera,
                                 bg_color=bg, render_cfg=render_cfg)
    elif name == "flashavatar":
        from fateavatar_tpu.models.baselines import flashavatar as FA

        net = bundle[2]

        def forward(params, state, expr, pose, camera, bg):
            return FA.flash_forward(model, params, net, expr, pose, camera,
                                    bg_color=bg, render_cfg=render_cfg)
    elif name == "splattingavatar":
        from fateavatar_tpu.models.baselines import splattingavatar as SA

        def forward(params, state, expr, pose, camera, bg):
            return SA.splat_forward(model, params, state, expr, pose, camera,
                                    bg_color=bg, render_cfg=render_cfg)
    elif name == "monogaussianavatar":
        from fateavatar_tpu.models.baselines import monogaussianavatar as MA

        nets = bundle[3]

        def forward(params, state, expr, pose, camera, bg):
            return MA.mono_forward(model, params, state, nets, expr, pose,
                                   camera, bg_color=bg, render_cfg=render_cfg)
    else:
        raise KeyError(f"no adapter for family {name!r}")

    epoch_hook = None
    if name == "monogaussianavatar":
        def epoch_hook(trainer, epoch):
            trainer.ts = BS.mono_epoch_maintenance(trainer.ts, model, epoch)

    return FamilyAdapter(
        name=name, step=step, init_ts=init_ts, forward=forward,
        epoch_hook=epoch_hook,
    )
