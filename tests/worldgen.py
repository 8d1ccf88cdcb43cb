"""Thin shim: the world generator lives in krepp_tpu.testing."""

from krepp_tpu.testing import BASES, make_world, mutate, sample_reads  # noqa: F401
