"""tpulc — TPU-native lossless compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities surveyed in
dingwentao/GPU-lossless-compression (see SURVEY.md):

- LZSS sliding-window codecs (CULZSS flag-byte and Dipperstein bitstream
  wire formats),
- canonical length-limited Huffman encoding with a fully parallel,
  self-synchronizing decoder (a scan-composition reformulation of the
  CUHD gap-array algorithm),
- the block-sorting family: BWT (rotation sort / sort-transform),
  MTF-as-a-scan, RLE, and bzip2-compatible entropy coding,
- a bsc-class large-block path (LZP + QLFC-rank + interleaved rANS).

Everything on the compute path is jittable JAX (lax.sort,
lax.associative_scan, scatter/gather bit packing, Pallas kernels for the
hot loops); blocks shard data-parallel over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"


def _enable_compile_cache() -> None:
    """Turn on JAX's persistent compilation cache for every tpulc entry
    point (CLI, library, bench).  Big-cap programs cost minutes to
    compile (tens of minutes through a remote-compile tunnel); the
    cache makes that a once-per-machine cost.  Opt out with
    TPULC_NO_COMPILE_CACHE=1; override the location with
    JAX_COMPILATION_CACHE_DIR."""
    import os

    if os.environ.get("TPULC_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        # Respect an explicit user configuration (jax.config or env):
        # never override a cache dir the consumer already chose.
        if jax.config.jax_compilation_cache_dir:
            return
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        base = repo if os.access(repo, os.W_OK) \
            else os.path.expanduser("~/.cache/tpulc")
        if not path:
            # CPU-backend executables are AOT-compiled for the host's
            # exact CPU features; sharing them across machines makes
            # cpu_aot_loader spew feature-mismatch errors and has
            # produced bogus execution failures.  Route CPU-only
            # processes to a per-machine partition; TPU processes keep
            # the shared .jax_cache (TPU executables target the chip,
            # not the host).
            platforms = str(getattr(jax.config, "jax_platforms", "")
                            or os.environ.get("JAX_PLATFORMS", ""))
            if platforms == "cpu":
                from tpulc.utils.cachedir import machine_cache_dir

                path = machine_cache_dir(
                    os.path.join(base, ".jax_cache_cpu"))
            else:
                path = os.path.join(base, ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()

from tpulc.pipeline.registry import available_codecs  # noqa: F401
