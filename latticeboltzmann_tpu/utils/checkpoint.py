"""Checkpoint / resume.

The reference has no resume path — its nearest artifact is the one-way
derived-field snapshot (SAVELATTICE, src/latticeboltzmann.c:53-54,
610-639). Saving the true f state makes restart exact: a checkpoint is
the full (9, NX, NY) distribution array plus the config and step count,
so a resumed run continues bit-for-bit (the state is Markov).

Format: <dir>/<step>.lbmckpt/ holding meta.json + f.raw (native-IO raw
dump; walls are re-derivable from the geometry spec but stored too for
self-containment).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from ..core.spec import LatticeConfig
from . import native


def save(directory, step: int, f: np.ndarray, walls: np.ndarray, cfg: LatticeConfig) -> pathlib.Path:
    d = pathlib.Path(directory) / f"{step}.lbmckpt"
    d.mkdir(parents=True, exist_ok=True)
    f = np.asarray(f)
    walls = np.asarray(walls).astype(np.uint8)
    meta = {
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
    (d / "meta.json").write_text(json.dumps(meta, indent=1))
    native.write_raw(str(d / "f.raw"), f)
    native.write_raw(str(d / "walls.raw"), walls)
    return d


def load(path) -> tuple[int, np.ndarray, np.ndarray, LatticeConfig]:
    d = pathlib.Path(path)
    meta = json.loads((d / "meta.json").read_text())
    dtype = np.dtype(meta["dtype"])
    cfg = LatticeConfig(
        nx=meta["nx"],
        ny=meta["ny"],
        tau=meta["tau"],
        csq=meta["csq"],
        accel=meta["accel"],
        initial_density=meta["initial_density"],
        dtype=dtype.type,
    )
    f = native.read_raw(str(d / "f.raw"), tuple(meta["f_shape"]), dtype)
    walls = native.read_raw(str(d / "walls.raw"), (meta["nx"], meta["ny"]), np.uint8).astype(bool)
    return meta["step"], f, walls, cfg


def latest(directory) -> pathlib.Path | None:
    d = pathlib.Path(directory)
    if not d.exists():
        return None
    ckpts = sorted(d.glob("*.lbmckpt"), key=lambda p: int(p.stem.split(".")[0]))
    return ckpts[-1] if ckpts else None
