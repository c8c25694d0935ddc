"""Checkpoint / resume.

The reference has no resume path — its nearest artifact is the one-way
derived-field snapshot (SAVELATTICE, src/latticeboltzmann.c:53-54,
610-639). Saving the true f state makes restart exact: a checkpoint is
the full (9, NX, NY) distribution array plus the config and step count,
so a resumed run continues bit-for-bit (the state is Markov).

Two formats:

- <dir>/<step>.lbmckpt/  — meta.json + f.raw/walls.raw via the native C++
  IO helper; fastest single-host path, no extra deps at load time.
- <dir>/<step>.orbax/    — Orbax StandardCheckpointer tree (f, walls,
  step) + meta.json. Orbax writes jax.Arrays shard-by-shard, so a
  row-sharded multi-chip state saves without gathering to one host —
  the multi-host resume path the raw format can't provide.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from ..core.spec import LatticeConfig
from . import native


def _meta(step: int, f, cfg: LatticeConfig) -> dict:
    return {
        "step": step,
        "nx": cfg.nx,
        "ny": cfg.ny,
        "tau": cfg.tau,
        "csq": cfg.csq,
        "accel": cfg.accel,
        "initial_density": cfg.initial_density,
        "dtype": np.dtype(cfg.dtype).name,
        "f_shape": list(f.shape),
    }


def _cfg_from_meta(meta: dict) -> LatticeConfig:
    return LatticeConfig(
        nx=meta["nx"],
        ny=meta["ny"],
        tau=meta["tau"],
        csq=meta["csq"],
        accel=meta["accel"],
        initial_density=meta["initial_density"],
        dtype=np.dtype(meta["dtype"]).type,
    )


def save(
    directory, step: int, f, walls, cfg: LatticeConfig, *, format: str = "raw"
) -> pathlib.Path:
    if format == "raw":
        d = pathlib.Path(directory) / f"{step}.lbmckpt"
        d.mkdir(parents=True, exist_ok=True)
        f = np.asarray(f)
        (d / "meta.json").write_text(json.dumps(_meta(step, f, cfg), indent=1))
        native.write_raw(str(d / "f.raw"), f)
        native.write_raw(str(d / "walls.raw"), np.asarray(walls).astype(np.uint8))
        return d
    if format == "orbax":
        import orbax.checkpoint as ocp

        # absolute: orbax requires absolute paths
        d = (pathlib.Path(directory) / f"{step}.orbax").absolute()
        meta = _meta(step, f, cfg)
        ckptr = ocp.StandardCheckpointer()
        # f is saved as passed — a sharded jax.Array is written
        # shard-by-shard by the hosts that own the shards.
        ckptr.save(d / "state", {"f": f, "walls": np.asarray(walls)})
        ckptr.wait_until_finished()
        (d / "meta.json").write_text(json.dumps(meta, indent=1))
        return d
    raise ValueError(f"unknown checkpoint format {format!r}; options: raw, orbax")


def load(path) -> tuple[int, np.ndarray, np.ndarray, LatticeConfig]:
    """Load either format (detected by directory suffix). Returns
    (step, f, walls, cfg) with host arrays; for sharded restore of an
    orbax checkpoint, restore <path>/state with orbax directly, passing
    the target sharding."""
    d = pathlib.Path(path)
    meta = json.loads((d / "meta.json").read_text())
    cfg = _cfg_from_meta(meta)
    dtype = np.dtype(meta["dtype"])
    if d.suffix == ".orbax":
        import orbax.checkpoint as ocp

        state = ocp.StandardCheckpointer().restore(d.absolute() / "state")
        f = np.asarray(state["f"], dtype=dtype)
        walls = np.asarray(state["walls"]).astype(bool)
    else:
        f = native.read_raw(str(d / "f.raw"), tuple(meta["f_shape"]), dtype)
        walls = native.read_raw(
            str(d / "walls.raw"), (meta["nx"], meta["ny"]), np.uint8
        ).astype(bool)
    return meta["step"], f, walls, cfg


def latest(directory) -> pathlib.Path | None:
    d = pathlib.Path(directory)
    if not d.exists():
        return None
    ckpts = sorted(
        (p for p in d.iterdir() if p.suffix in (".lbmckpt", ".orbax")),
        key=lambda p: int(p.stem.split(".")[0]),
    )
    return ckpts[-1] if ckpts else None
