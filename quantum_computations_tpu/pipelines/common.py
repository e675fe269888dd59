"""Shared pipeline infrastructure.

The reference hardcodes parameters in ``main()`` blocks and checkpoints by
rewriting whole JSON files (``grover.py:140-143``). Here every pipeline has a
dataclass config with CLI binding, and the same incremental-JSON `.dat`
output schema so the reference notebooks' analysis logic can be re-run as
parity checks.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Any


def setup_compile_cache(path: str | None = None):
    """Point JAX's persistent compilation cache at the repo-level `.jax_cache`.

    Production drivers compile tens of op-level executors (one per gadget-op x
    chain-shape signature); on the tunnelled accelerator a cold compile costs
    30-300 s, so the cache is the difference between hour-scale warmup and
    seconds. Safe to call repeatedly; a no-op if the cache is already set.
    """
    import jax

    if path is None:
        path = os.environ.get("QCT_COMPILE_CACHE") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def write_data(path: str, data: list[dict]):
    """Whole-file JSON rewrite (reference checkpointing pattern).

    `default=float` guards against numpy scalars (np.float32 is NOT a
    Python-float subclass and would otherwise abort a long sweep at its
    first checkpoint write).
    """
    with open(path, "w") as fh:
        fh.write(json.dumps(data, default=float))


def prepare_output(path: str, overwrite: bool = False):
    if path is None:
        return
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(f"File {path} already exists!")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    open(path, "w").close()


def config_cli(config_cls, argv=None):
    """Build an argparse CLI from a dataclass config and parse argv.

    Also turns on INFO logging: this is only called from driver
    ``__main__`` blocks, where per-cell progress lines are the entire
    user-visible output of an hours-long sweep.
    """
    import logging

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s: %(message)s", datefmt="%H:%M:%S")
    parser = argparse.ArgumentParser(description=config_cls.__doc__)
    for f in dataclasses.fields(config_cls):
        arg = "--" + f.name.replace("_", "-")
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
            default = f.default_factory()  # type: ignore[misc]
        if f.type in ("bool", bool):
            parser.add_argument(arg, action="store_true" if not default else "store_false")
        elif f.type in ("int", int):
            parser.add_argument(arg, type=int, default=default)
        elif f.type in ("float", float):
            parser.add_argument(arg, type=float, default=default)
        else:
            parser.add_argument(arg, type=str, default=default)
    ns = parser.parse_args(argv)
    kwargs = {f.name: getattr(ns, f.name) for f in dataclasses.fields(config_cls)}
    return config_cls(**kwargs)
