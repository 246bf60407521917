"""Minimal functional module system.

Modules are plain Python objects holding static configuration; parameters
live in nested dicts (pytrees) that flow through jit/pjit/optax untouched.
The contract mirrors the reference's unified build/compute_output_shape
design (tf2_components/layers/tf2c_base_layer.py:17-53) but functionally:

    params, out_shape = module.init(rng, in_shape)   # shapes are (..., T, C)
    y = module(params, x)

Shape tuples use a representative time length; `out_length` gives the static
time algebra used for trimming (all shapes under jit are static).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax


class Module:
    name: str = "module"

    def init(self, rng, in_shape) -> Tuple[Dict[str, Any], Tuple]:
        raise NotImplementedError

    def __call__(self, params, x, **kwargs):
        raise NotImplementedError

    def out_length(self, in_len: int) -> int:
        return in_len


class Sequential(Module):
    """Applies sub-modules in order; params keyed by sub-module name."""

    def __init__(self, layers: Sequence[Module], name: str = "sequential"):
        self.layers = list(layers)
        self.name = name
        names = [l.name for l in self.layers]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate layer names in {name}: {names}")

    def init(self, rng, in_shape):
        params = {}
        shape = in_shape
        for layer in self.layers:
            rng, sub = jax.random.split(rng)
            p, shape = layer.init(sub, shape)
            if p:
                params[layer.name] = p
        return params, shape

    def __call__(self, params, x, **kwargs):
        for layer in self.layers:
            x = layer(params.get(layer.name, {}), x, **kwargs)
        return x

    def out_length(self, in_len: int) -> int:
        for layer in self.layers:
            in_len = layer.out_length(in_len)
        return in_len
