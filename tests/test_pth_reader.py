"""Torch-free .pth reader parity: load_pth must byte-match torch.load on
crafted checkpoints in BOTH on-disk formats (zip, torch >= 1.6; legacy stream,
the lpips-0.1.4-era format), so weight conversion and reference-checkpoint
migration run on hosts without torch (reference checkpoints:
src/trainers/base.py:166-187; lpips weights: src/losses/perceptual_loss.py:100-102).
"""

from __future__ import annotations

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ddpm_ood_tpu.utils.pth_reader import load_pth  # noqa: E402


def _crafted_state_dict():
    g = torch.Generator().manual_seed(0)
    return {
        "conv.weight": torch.randn(8, 3, 3, 3, generator=g),
        "conv.bias": torch.randn(8, generator=g),
        "norm.weight": torch.randn(8, generator=g, dtype=torch.float64),
        "step": torch.tensor(7, dtype=torch.int64),
        "flags": torch.tensor([True, False]),
        "half": torch.randn(4, 4, generator=g).half(),
    }


def _assert_matches_torch(loaded, reference):
    assert set(loaded) == set(reference)
    for k, ref in reference.items():
        got = loaded[k]
        assert isinstance(got, np.ndarray), k
        np.testing.assert_array_equal(got, ref.numpy(), err_msg=k)
        assert got.dtype == ref.numpy().dtype, k


@pytest.mark.parametrize("zip_format", [True, False], ids=["zip", "legacy"])
def test_load_pth_matches_torch(tmp_path, zip_format):
    sd = _crafted_state_dict()
    path = tmp_path / "ckpt.pth"
    torch.save(sd, path, _use_new_zipfile_serialization=zip_format)
    _assert_matches_torch(load_pth(str(path)), sd)


@pytest.mark.parametrize("zip_format", [True, False], ids=["zip", "legacy"])
def test_load_pth_nested_tree_and_views(tmp_path, zip_format):
    """Reference checkpoints nest dicts and share storage via views
    (non-contiguous slices must materialize to the right values)."""
    g = torch.Generator().manual_seed(1)
    base = torch.randn(6, 4, generator=g)
    ckpt = {
        "epoch": 3,
        "model_state_dict": {"w": base.t(), "row": base[2]},  # transposed view
        "best_loss": 0.25,
    }
    path = tmp_path / "nested.pth"
    torch.save(ckpt, path, _use_new_zipfile_serialization=zip_format)
    got = load_pth(str(path))
    assert got["epoch"] == 3 and got["best_loss"] == 0.25
    np.testing.assert_array_equal(got["model_state_dict"]["w"], base.t().numpy())
    np.testing.assert_array_equal(got["model_state_dict"]["row"], base[2].numpy())
    assert got["model_state_dict"]["w"].flags["C_CONTIGUOUS"]


def test_load_pth_blocks_arbitrary_globals(tmp_path):
    """A pickle that smuggles a non-tensor global must be rejected, not run."""
    path = tmp_path / "evil.pth"
    payload = pickle.dumps({"x": __import__("os").system})
    path.write_bytes(payload)
    with pytest.raises(Exception, match="blocked global|bad magic|not a legacy"):
        load_pth(str(path))


def test_load_pth_real_unet_checkpoint_shape(tmp_path):
    """A reference-schema checkpoint (base.py:166-187) round-trips whole."""
    sd = {f"layer{i}.weight": torch.randn(2, 2) for i in range(3)}
    ckpt = {
        "epoch": 11,
        "global_step": 4096,
        "model_state_dict": sd,
        "best_loss": 0.125,
    }
    path = tmp_path / "reference.pth"
    torch.save(ckpt, path)
    got = load_pth(str(path))
    assert got["global_step"] == 4096
    _assert_matches_torch(got["model_state_dict"], sd)


# ---------------------------------------------------------------------------
# Hostile-checkpoint hardening (ADVICE r4): the legacy framing headers must go
# through a globals-blocked unpickler, and pickle-controlled tensor geometry
# must be bounds-checked before as_strided.
# ---------------------------------------------------------------------------

import io  # noqa: E402
import struct  # noqa: E402


class _EvilReduce:
    """Pickles to a REDUCE that would create a sentinel file if executed."""

    def __init__(self, sentinel):
        self.sentinel = sentinel

    def __reduce__(self):
        return (open, (str(self.sentinel), "w"))


def test_legacy_header_blocks_code_execution(tmp_path):
    """A hostile magic-number header pickle must be rejected WITHOUT running
    its payload (regression: pickle.load was previously unrestricted for the
    magic/protocol/sys_info/key-list frames)."""
    sentinel = tmp_path / "pwned"
    path = tmp_path / "evil_legacy.pth"
    buf = io.BytesIO()
    pickle.dump(_EvilReduce(sentinel), buf, protocol=2)
    path.write_bytes(buf.getvalue())
    with pytest.raises(pickle.UnpicklingError, match="framing header"):
        load_pth(str(path))
    assert not sentinel.exists(), "hostile header pickle was EXECUTED"


def test_legacy_key_list_blocks_code_execution(tmp_path):
    """Same for the storage-key-list frame after the payload pickle."""
    sd = {"w": torch.randn(2, 2)}
    path = tmp_path / "tail_evil.pth"
    torch.save(sd, path, _use_new_zipfile_serialization=False)
    raw = path.read_bytes()
    # the key list is the 5th pickle frame; locate it by replaying the first
    # four frames with a permissive unpickler on the real file
    f = io.BytesIO(raw)
    for _ in range(3):
        pickle.load(f)  # magic, protocol, sys_info

    class _Permissive(pickle.Unpickler):
        # we only need f.tell() after the payload frame — neuter everything
        def persistent_load(self, pid):
            return None

        def find_class(self, module, name):
            return lambda *a, **k: None

    _Permissive(f).load()  # payload
    keys_at = f.tell()
    sentinel = tmp_path / "pwned2"
    evil = io.BytesIO()
    pickle.dump(_EvilReduce(sentinel), evil, protocol=2)
    path.write_bytes(raw[:keys_at] + evil.getvalue())
    with pytest.raises(pickle.UnpicklingError, match="framing header"):
        load_pth(str(path))
    assert not sentinel.exists(), "hostile key-list pickle was EXECUTED"


def _craft_legacy(tmp_path, offset, size, stride, declared_numel=4,
                  stream_numel=4, blob_elems=4):
    """Hand-build a legacy checkpoint with attacker-controlled geometry."""
    import collections

    class _Stub:
        pass

    stub = _Stub()

    class _Tensor:
        def __reduce__(self):
            return (
                torch._utils._rebuild_tensor_v2,
                (stub, offset, size, stride, False, collections.OrderedDict()),
            )

    class _W(pickle.Pickler):
        def persistent_id(self, obj):
            if obj is stub:
                return ("storage", torch.FloatStorage, "0", "cpu",
                        declared_numel)
            return None

    buf = io.BytesIO()
    pickle.dump(0x1950A86A20F9469CFC6C, buf, protocol=2)
    pickle.dump(1001, buf, protocol=2)
    pickle.dump({"protocol_version": 1001, "little_endian": True,
                 "type_sizes": {}}, buf, protocol=2)
    _W(buf, protocol=2).dump({"w": _Tensor()})
    pickle.dump(["0"], buf, protocol=2)
    buf.write(struct.pack("<q", stream_numel))
    buf.write(b"\x00" * (4 * blob_elems))
    path = tmp_path / "crafted.pth"
    path.write_bytes(buf.getvalue())
    return str(path)


def test_out_of_bounds_view_rejected(tmp_path):
    """offset/size/stride pointing past the storage must raise, not read
    out-of-bounds process memory via as_strided."""
    path = _craft_legacy(tmp_path, offset=0, size=(1000,), stride=(1,))
    with pytest.raises(ValueError, match="out of bounds"):
        load_pth(path)
    path = _craft_legacy(tmp_path, offset=3, size=(2,), stride=(1,))
    with pytest.raises(ValueError, match="out of bounds"):
        load_pth(path)


def test_negative_geometry_rejected(tmp_path):
    for bad in (
        dict(offset=-1, size=(2,), stride=(1,)),
        dict(offset=0, size=(-2,), stride=(1,)),
        dict(offset=0, size=(2,), stride=(-1,)),
    ):
        path = _craft_legacy(tmp_path, **bad)
        with pytest.raises(ValueError, match="negative"):
            load_pth(path)


def test_numel_mismatch_rejected(tmp_path):
    path = _craft_legacy(tmp_path, offset=0, size=(4,), stride=(1,),
                         declared_numel=4, stream_numel=999, blob_elems=999)
    with pytest.raises(ValueError, match="corrupt storage"):
        load_pth(path)


def test_valid_crafted_geometry_still_loads(tmp_path):
    """The bounds checks must not reject legitimate in-bounds views."""
    path = _craft_legacy(tmp_path, offset=1, size=(3,), stride=(1,))
    got = load_pth(path)
    np.testing.assert_array_equal(got["w"], np.zeros(3, np.float32))
