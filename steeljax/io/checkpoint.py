"""Checkpoint/resume for long renders and bakes.

The reference has no persistence (SURVEY.md §5): its accumulation image
resets rather than saves.  Here accumulation state and light-volume bakes
are explicit pytrees, so checkpointing is an npz round-trip — long
converging renders and probe bakes survive restarts.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from steeljax.render.pt.renderer import AccumulationState


def save_accumulation(path: str | Path, state: AccumulationState) -> None:
    np.savez_compressed(
        path, accumulated=np.asarray(state.accumulated),
        index=np.asarray(state.index))


def load_accumulation(path: str | Path) -> AccumulationState:
    data = np.load(path)
    return AccumulationState(
        accumulated=jnp.asarray(data["accumulated"]),
        index=jnp.asarray(data["index"]))


def save_light_volume(path: str | Path, volume) -> None:
    np.savez_compressed(
        path,
        positions=np.asarray(volume.positions),
        tet_vertices=np.asarray(volume.tet_vertices),
        tet_neighbors=np.asarray(volume.tet_neighbors),
        tet_matrices=np.asarray(volume.tet_matrices),
        coefficients=np.asarray(volume.coefficients))


def load_light_volume(path: str | Path):
    from steeljax.gi.light_volume import LightVolume
    data = np.load(path)
    return LightVolume(
        positions=jnp.asarray(data["positions"]),
        tet_vertices=jnp.asarray(data["tet_vertices"]),
        tet_neighbors=jnp.asarray(data["tet_neighbors"]),
        tet_matrices=jnp.asarray(data["tet_matrices"]),
        coefficients=jnp.asarray(data["coefficients"]))
