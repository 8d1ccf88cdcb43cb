"""krepp-tpu: TPU-native k-mer LSH indexing, ML distance estimation and
phylogenetic placement.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
bo1929/krepp (reference mounted at /root/reference): `index`, `dist`, `place`,
`sketch`, `seek`, `inspect`.

Design (TPU-first, not a port):
  * k-mers are handled as windows of small integer base codes; LSH hashes and
    residual encodings are computed as dot products with static 0/1 weight
    vectors (MXU/VPU friendly) instead of the reference's BMI2 PEXT bit tricks
    (ref: src/lshf.cpp:61-71).
  * the frozen index is a pair of dense HBM arrays (residuals + colors) with a
    CSR row-offset array (ref: src/table.hpp:103-146), sharded by LSH-row
    block across a device mesh.
  * the per-read match state is order-independent: a segment-min over bucket
    entries per (read, position, leaf) followed by a histogram, replacing the
    reference's sequential dedupe (ref: src/query.hpp:153-176).
  * the ML distance solver is a batched, fixed-iteration Brent minimizer in
    f64 replicating boost::math::tools::brent_find_minima semantics
    (ref: src/query.cpp:426-433).
"""

__version__ = "0.1.0"

# Version string of the reference tool whose behaviour we reproduce
# (ref: src/common.hpp:50).
REFERENCE_VERSION = "v0.8.3"


def enable_x64() -> None:
    """Enable 64-bit mode; required for the f64 likelihood path."""
    import jax

    jax.config.update("jax_enable_x64", True)


def configure(cache_dir: str | None = None) -> None:
    """Standard runtime configuration: x64 + persistent compilation cache.

    The compilation cache matters a lot on remotely-attached TPUs where a
    cold compile takes tens of seconds.
    """
    import os

    import jax

    enable_x64()
    cache_dir = cache_dir or os.environ.get(
        "KREPP_TPU_CACHE", os.path.expanduser("~/.cache/krepp_tpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass
