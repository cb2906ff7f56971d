"""Round-trip: rpo_tpu checkpoint -> reference torch format -> back.

The exported payload must be loadable by torch, carry the reference's
key names/layouts, and round-trip bit-exactly through this framework's
torch-checkpoint importer (_load_checkpoint_file + the method's
set_ckpt_state remap)."""
import os
import pickle

import numpy as np


def _save_ours(path, state):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(
            {"state_dict": state, "epoch": 15, "optimizer": None,
             "val_result": 80.0},
            f,
        )


def test_rpo_export_roundtrip(tmp_path):
    import torch

    from rpo_tpu.engine.trainer import _load_checkpoint_file
    from tools.export_torch_ckpt import export

    rng = np.random.RandomState(0)
    state = {
        "text_prompt": rng.randn(4, 16).astype(np.float32),
        "img_prompt": rng.randn(4, 24).astype(np.float32),
    }
    src = str(tmp_path / "m" / "model.pth.tar-15")
    _save_ours(src, state)
    out = str(tmp_path / "ref.pth.tar-15")
    assert export(src, out) == "rpo"

    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 15
    assert isinstance(ckpt["state_dict"]["text_prompt"], torch.Tensor)
    back = _load_checkpoint_file(out)  # the zip/torch import path
    for k in state:
        np.testing.assert_array_equal(back["state_dict"][k], state[k])


def test_cocoop_and_lp_export_layouts(tmp_path):
    import torch

    from tools.export_torch_ckpt import export

    rng = np.random.RandomState(1)
    meta = {
        "w1": rng.randn(8, 2).astype(np.float32),
        "b1": rng.randn(2).astype(np.float32),
        "w2": rng.randn(2, 16).astype(np.float32),
        "b2": rng.randn(16).astype(np.float32),
    }
    src = str(tmp_path / "m" / "model.pth.tar-10")
    _save_ours(src, {"ctx": rng.randn(4, 16).astype(np.float32), "meta_net": meta})
    out = str(tmp_path / "cocoop.torch")
    assert export(src, out) == "cocoop"
    sd = torch.load(out, map_location="cpu", weights_only=False)["state_dict"]
    # torch Linear applies x @ W.T: W must be the transpose of our w
    np.testing.assert_allclose(sd["meta_net.linear1.weight"].numpy(), meta["w1"].T)
    np.testing.assert_allclose(sd["meta_net.linear2.weight"].numpy(), meta["w2"].T)

    w = rng.randn(6, 6).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    src2 = str(tmp_path / "m2" / "model.pth.tar-10")
    _save_ours(src2, {"w": w, "b": b})
    out2 = str(tmp_path / "lp.torch")
    assert export(src2, out2) == "lp"
    sd2 = torch.load(out2, map_location="cpu", weights_only=False)["state_dict"]
    np.testing.assert_allclose(sd2["weight"].numpy(), w.T)
    np.testing.assert_allclose(sd2["bias"].numpy(), b)

    # and the LP importer inverts the export exactly
    from rpo_tpu.methods.linear_probe import LP

    tr = object.__new__(LP)
    tr.set_ckpt_state(
        "lp_layer",
        {"weight": sd2["weight"].numpy(), "bias": sd2["bias"].numpy()},
    )
    np.testing.assert_allclose(np.asarray(tr.params["w"]), w, rtol=1e-6)
