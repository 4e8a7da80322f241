"""Restricted ingestion of official StyleGAN-family network pickles.

Writes a synthetic pkl in the exact ``torch_utils.persistence`` on-disk
format (module graph reduced to ``_reconstruct_persistent_obj(meta)``
calls, embedded ``module_src``, EasyDict metadata) using throwaway writer
modules, then loads it with the RESTRICTED unpickler — asserting the
tensors come back exactly, the embedded source is never executed, and
dangerous globals are refused. Mirrors what the reference's
``legacy.load_network_pkl`` consumes (train/completion.py:592) without
the original repos.
"""

import collections
import os
import pickle
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fateavatar_tpu.completion.eg3d.networks import (
    eg3d_random_params, render_full, tiny_test_config,
)
from fateavatar_tpu.completion.eg3d.pkl_ingest import (
    PersistentStub, load_eg3d_from_pkl, load_network_pkl_tensors,
)

MODULE_SRC = "raise RuntimeError('embedded network source was executed!')\n"


@pytest.fixture(scope="module")
def writer_modules():
    """Throwaway `torch_utils.persistence` / `dnnlib` so pickling records
    the real qualified names. Removed afterwards — the LOADER must not
    need them."""
    saved = {k: sys.modules.get(k) for k in
             ("torch_utils", "torch_utils.persistence", "dnnlib")}
    tu = types.ModuleType("torch_utils")
    pers = types.ModuleType("torch_utils.persistence")

    def _reconstruct_persistent_obj(meta):   # writer side: never called
        raise AssertionError("writer-side reconstructor invoked")

    # pickle records globals by (module, qualname) — make the writer-side
    # function carry the REAL persistence names
    _reconstruct_persistent_obj.__module__ = "torch_utils.persistence"
    _reconstruct_persistent_obj.__qualname__ = "_reconstruct_persistent_obj"
    pers._reconstruct_persistent_obj = _reconstruct_persistent_obj
    tu.persistence = pers

    dnnlib = types.ModuleType("dnnlib")

    class EasyDict(dict):
        def __getattr__(self, k):
            return self[k]

    EasyDict.__module__ = "dnnlib"
    EasyDict.__qualname__ = "EasyDict"
    dnnlib.EasyDict = EasyDict
    sys.modules.update({"torch_utils": tu, "torch_utils.persistence": pers,
                        "dnnlib": dnnlib})
    yield pers, dnnlib
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


class _Persisted:
    """Writer-side stand-in for a persistence-wrapped nn.Module: pickles
    exactly like one."""

    def __init__(self, meta):
        self.meta = meta

    def __reduce__(self):
        fn = sys.modules["torch_utils.persistence"]._reconstruct_persistent_obj
        return (fn, (self.meta,))


def _nest_state_dict(flat, easydict, class_name="Generator"):
    """flat {'a.b.weight': tensor} -> persistence module graph."""
    import torch

    params = collections.OrderedDict()
    children = {}
    for k, v in flat.items():
        if "." in k:
            head, rest = k.split(".", 1)
            children.setdefault(head, {})[rest] = v
        else:
            params[k] = torch.from_numpy(np.asarray(v))
    modules = collections.OrderedDict(
        (name, _nest_state_dict(sub, easydict, class_name=name))
        for name, sub in children.items())
    state = dict(_parameters=params, _buffers=collections.OrderedDict(),
                 _modules=modules, training=False)
    meta = easydict(type="class", version=6, module_src=MODULE_SRC,
                    class_name=class_name, state=state)
    return _Persisted(meta)


@pytest.fixture(scope="module")
def tiny_pkl(tmp_path_factory, writer_modules):
    pers, dnnlib = writer_modules
    cfg = tiny_test_config()
    p = eg3d_random_params(jax.random.PRNGKey(0), cfg)
    flat = {k: np.asarray(v) for k, v in p.items()}
    g_ema = _nest_state_dict(flat, dnnlib.EasyDict)
    g_ema.meta["state"]["rendering_kwargs"] = dnnlib.EasyDict(
        ray_start=2.35, ray_end=3.3, depth_resolution=48)
    g_ema.meta["state"]["neural_rendering_resolution"] = (
        cfg.neural_resolution)
    data = {
        "G": _nest_state_dict(flat, dnnlib.EasyDict),
        "G_ema": g_ema,
        "training_set_kwargs": dnnlib.EasyDict(resolution=512),
        "augment_pipe": None,
    }
    path = tmp_path_factory.mktemp("pkl") / "network-snapshot.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f, protocol=4)   # upstream pkls use protocol 4
    # protocol 2 (oldest in the wild) must load identically
    path2 = tmp_path_factory.mktemp("pkl") / "network-snapshot-p2.pkl"
    with open(path2, "wb") as f:
        pickle.dump(data, f, protocol=2)
    return str(path), cfg, p


class TestRestrictedLoad:
    def test_tensors_roundtrip_without_executing_source(self, tiny_pkl):
        path, cfg, p = tiny_pkl
        nets = load_network_pkl_tensors(path)
        assert set(nets) == {"G", "G_ema"}
        sd, attrs = nets["G_ema"]
        assert set(sd) == set(p)
        for k in p:
            np.testing.assert_array_equal(sd[k], np.asarray(p[k]))
        assert attrs["rendering_kwargs"]["ray_start"] == 2.35
        assert attrs["neural_rendering_resolution"] == cfg.neural_resolution

    def test_protocol2_loads_identically(self, tiny_pkl):
        path, cfg, p = tiny_pkl
        import glob
        cands = glob.glob(os.path.join(os.path.dirname(os.path.dirname(path)),
                                       "*", "network-snapshot-p2.pkl"))
        assert cands, "protocol-2 fixture missing"
        nets = load_network_pkl_tensors(cands[0])
        sd, _ = nets["G_ema"]
        assert set(sd) == set(p)

    def test_load_eg3d_from_pkl_end_to_end(self, tiny_pkl):
        path, cfg, p = tiny_pkl
        params, inferred, attrs = load_eg3d_from_pkl(path)
        assert inferred.backbone_resolution == cfg.backbone_resolution
        assert inferred.w_dim == cfg.w_dim
        # loaded params drive the SAME render as the originals
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = -2.7
        from fateavatar_tpu.completion.eg3d.networks import eg3d_camera_label
        label = jnp.asarray(eg3d_camera_label(c2w))[None]
        z = jnp.zeros((1, cfg.z_dim))
        out_a = render_full(p, cfg, z, label)["image"]
        out_b = render_full(params, cfg, z, label)["image"]
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   atol=1e-6)

    def test_blocked_global_raises(self, tmp_path, writer_modules):
        import os as _os
        path = tmp_path / "evil.pkl"
        with open(path, "wb") as f:
            pickle.dump({"G_ema": _os.system}, f)
        with pytest.raises(pickle.UnpicklingError, match="blocked global"):
            load_network_pkl_tensors(str(path))

    def test_zipfile_checkpoint_refused(self, tmp_path):
        torch = pytest.importorskip("torch")
        path = tmp_path / "ckpt.pth"
        torch.save({"w": torch.zeros(3)}, str(path))
        with pytest.raises(ValueError, match="zip archive"):
            load_network_pkl_tensors(str(path))

    def test_plain_setstate_variant(self, tmp_path, writer_modules):
        """Pickles that restore stubs via __setstate__ (no reduce) still
        yield their tensors."""
        import torch

        stub = PersistentStub()
        stub.meta = {"class_name": "Leaf", "state": {
            "_parameters": collections.OrderedDict(
                weight=torch.ones(2, 3)),
            "_buffers": collections.OrderedDict(),
            "_modules": collections.OrderedDict(),
        }}
        sd = {}
        from fateavatar_tpu.completion.eg3d.pkl_ingest import _walk_module
        _walk_module(stub, "", sd)
        assert set(sd) == {"weight"}
        assert sd["weight"].shape == (2, 3)
