"""Quantizers: vector <-> compact code, decoded inside the scoring kernel."""

from fastforward_tpu.quantizer.base import Quantizer
from fastforward_tpu.quantizer.pq import OPQ, PQ, NanoOPQ, NanoPQ
from fastforward_tpu.quantizer.scalar import ScalarQuantizer

__all__ = ["Quantizer", "PQ", "OPQ", "NanoPQ", "NanoOPQ", "ScalarQuantizer"]
