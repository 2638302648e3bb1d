"""Pure-python safetensors format reader/writer.

The image has no `safetensors` package, but real CLIP/RemoteCLIP/SigLIP
checkpoints increasingly ship in this format, and the hub-export surface
(reference open_clip/push_to_hf_hub.py:89-116 saves
`open_clip_model.safetensors`) needs a writer. The format is simple enough
to implement exactly: an 8-byte little-endian header length, a JSON header
mapping tensor names to {dtype, shape, data_offsets}, then the raw
little-endian tensor bytes back to back.
"""

from __future__ import annotations

import json
import struct

import numpy as np

__all__ = ["save_safetensors", "load_safetensors"]

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_, "U16": np.uint16, "U32": np.uint32,
    "U64": np.uint64,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _bfloat16():
    import ml_dtypes
    return np.dtype(ml_dtypes.bfloat16)


def _dtype_name(dt: np.dtype) -> str:
    try:
        if dt == _bfloat16():
            return "BF16"
    except ImportError:
        pass
    try:
        return _DTYPE_NAMES[np.dtype(dt)]
    except KeyError:
        raise ValueError(f"unsupported dtype for safetensors: {dt}") from None


def _dtype_from_name(name: str) -> np.dtype:
    if name == "BF16":
        return _bfloat16()
    try:
        return np.dtype(_DTYPES[name])
    except KeyError:
        raise ValueError(f"unsupported safetensors dtype: {name}") from None


def save_safetensors(tensors: dict[str, np.ndarray], path: str,
                     metadata: dict[str, str] | None = None) -> None:
    """Write `{name: array}` to `path` in safetensors layout (sorted names,
    contiguous little-endian data)."""
    header: dict[str, object] = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    blobs: list[bytes] = []
    offset = 0
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        blob = arr.tobytes()
        header[name] = {
            "dtype": _dtype_name(arr.dtype),
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(blob)],
        }
        blobs.append(blob)
        offset += len(blob)
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # spec: pad the header with spaces to an 8-byte multiple
    pad = (-len(hjson)) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    """Read a safetensors file into `{name: np.ndarray}` (bf16 supported via
    ml_dtypes)."""
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode("utf-8"))
        data = f.read()
    out: dict[str, np.ndarray] = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        start, end = info["data_offsets"]
        dt = _dtype_from_name(info["dtype"])
        arr = np.frombuffer(data[start:end], dtype=dt)
        out[name] = arr.reshape(info["shape"])
    return out
