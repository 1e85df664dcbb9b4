"""zlib_rs_tpu — a TPU-native DEFLATE/zlib/gzip codec framework.

Built from scratch in JAX/XLA/Pallas with the full capability surface of the
reference zlib-rs library (see SURVEY.md). The compute path is chunk-parallel:
LZ77 match finding, Huffman construction, and bitstream packing are expressed
as fixed-shape vector/matrix programs; chunks are composed with pigz-style
sync-flush seams and checksum-combine operators, sharded over a device mesh
via shard_map.

Public surface (mirroring zlib-rs L2/L3 semantics):
  * one-shot: compress / decompress / compress_bound
  * streaming: Deflate / Inflate stream objects with zlib flush semantics
  * checksums: adler32 / crc32 and their combine operators
  * gzip file API: GzFile (gz* family)
"""

from .config import (  # noqa: F401
    CONFIGURATION_TABLE,
    DeflateConfig,
    DeflateFlush,
    GzHeader,
    InflateConfig,
    InflateFlush,
    Method,
    ReturnCode,
    Strategy,
    Wrap,
    Z_DEFAULT_COMPRESSION,
)
from .ops.checksum import (  # noqa: F401
    adler32,
    adler32_combine,
    crc32,
    crc32_combine,
    crc32_combine_gen,
    crc32_combine_op,
)

__version__ = "0.1.0"
ZLIB_VERSION = "1.3.0-zlib-rs-tpu-" + __version__


def zlib_version() -> str:
    """Version string, zlib-style (reference: libz-rs-sys/src/lib.rs:1948)."""
    return ZLIB_VERSION


# Lazy imports for the heavier API layers (they pull in jax).
def __getattr__(name):
    if name in ("compress", "decompress", "compress_bound", "uncompress"):
        from .models import oneshot

        return getattr(oneshot, name)
    if name in ("Deflate", "Inflate"):
        from .models import stream

        return getattr(stream, name)
    if name == "GzFile":
        from .models.gzfile import GzFile

        return GzFile
    if name == "gzopen":
        from .models.gzfile import gzopen

        return gzopen
    if name in ("compress_parallel", "decompress_parallel"):
        from .parallel import pipeline

        return getattr(pipeline, name)
    if name == "decompress_foreign":
        from .parallel.inflate import decompress_foreign

        return decompress_foreign
    if name in ("gzdopen", "gzclose_r", "gzclose_w"):
        from .models import gzfile

        return getattr(gzfile, name)
    if name in ("InflateBack", "inflate_back"):
        from .models import infback

        return getattr(infback, name)
    if name in ("build_index", "extract"):
        from .models import zran

        return getattr(zran, name)
    if name == "compress_medium":
        from .models.medium import compress_medium

        return compress_medium
    if name in ("DeviceInflateState", "device_decode_step", "device_decode_streaming"):
        from .parallel import checkpoint

        return {
            "DeviceInflateState": checkpoint.DeviceInflateState,
            "device_decode_step": checkpoint.decode_step,
            "device_decode_streaming": checkpoint.decode_streaming,
        }[name]
    if name == "native":
        import importlib

        return importlib.import_module(".native", __name__)
    if name in ("z_error", "zError", "get_crc_table", "zlib_compile_flags", "zlibCompileFlags"):
        from . import compat

        return getattr(compat, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
