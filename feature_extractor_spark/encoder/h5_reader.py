"""Minimal pure-Python HDF5 reader for legacy Keras weight files.

This container has no h5py/TensorFlow, but the reference ships golden
trained models (/root/reference/tests/models/*.h5.keras — raw HDF5 despite
the extension). This reader implements exactly the subset those files use
(h5py-written, superblock v0, v1 object headers, v1 group B-trees + local
heaps, contiguous little-endian float/int datasets, fixed-size and
NULL-padded string attributes, variable-length string attributes via the
global heap) so golden weights can be loaded into the NumPy plugin graphs.

Public surface:
    read_h5(path) -> {"attrs": {...}, "groups": {name: {...}},
                      "datasets": {"/path": np.ndarray}}
    keras_weights(path) -> {layer_name: {weight_name: np.ndarray}}
                           + ["__model_config__"] JSON string when present

Format reference: the public HDF5 File Format Specification v1.0
(https://support.hdfgroup.org/documentation/) — structure offsets only;
no code derived from libhdf5/h5py.
"""

from __future__ import annotations

import json
import struct

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF


class H5(dict):
    pass


def _u(data, off, n):
    return int.from_bytes(data[off : off + n], "little")


def _parse_datatype(body):
    """Returns (kind, size, meta). kind in {'int','float','string','vlen_str',
    'compound?'} — only what Keras files contain."""
    cls_ver = body[0]
    cls = cls_ver & 0x0F
    size = _u(body, 4, 4)
    bits0 = body[1]
    if cls == 0:
        signed = bool(bits0 & 0x08)
        return ("int", size, {"signed": signed})
    if cls == 1:
        return ("float", size, {})
    if cls == 3:
        return ("string", size, {})
    if cls == 9:
        # variable length; base type in the remainder — Keras uses vlen str
        vtype = bits0 & 0x0F
        return ("vlen_str" if vtype == 1 else "vlen", size, {})
    return (f"class{cls}", size, {})


def _np_dtype(kind, size):
    if kind == "float":
        return {2: np.float16, 4: np.float32, 8: np.float64}[size]
    if kind == "int":
        return {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}[size]
    raise ValueError(f"unsupported dataset type {kind}{size}")


def _parse_dataspace(body):
    ver = body[0]
    if ver == 1:
        rank, flags = body[1], body[2]
        off = 8
    elif ver == 2:
        rank, flags = body[1], body[2]
        off = 4
    else:
        raise ValueError(f"dataspace version {ver}")
    dims = [_u(body, off + 8 * i, 8) for i in range(rank)]
    return dims


def _global_heap_object(data, addr, index):
    """Fetch object `index` from the global heap collection at `addr`."""
    assert data[addr : addr + 4] == b"GCOL", "bad global heap signature"
    size = _u(data, addr + 8, 8)
    off = addr + 16
    end = addr + size
    while off < end:
        idx = _u(data, off, 2)
        obj_size = _u(data, off + 8, 8)
        if idx == index:
            return data[off + 16 : off + 16 + obj_size]
        if idx == 0:
            break
        off += 16 + ((obj_size + 7) & ~7)
    raise KeyError(f"global heap object {index} not found at {addr}")


def _read_attr_value(data, kind, size, meta, dims, raw):
    n = int(np.prod(dims)) if dims else 1
    if kind == "string":
        vals = []
        for i in range(n):
            s = raw[i * size : (i + 1) * size].split(b"\x00", 1)[0]
            vals.append(s.decode("utf-8", "replace"))
        return vals[0] if not dims else vals
    if kind == "vlen_str":
        vals = []
        for i in range(n):
            rec = raw[i * 16 : (i + 1) * 16]
            length = _u(rec, 0, 4)
            gaddr = _u(rec, 4, 8)
            gidx = _u(rec, 12, 4)
            vals.append(
                _global_heap_object(data, gaddr, gidx)[:length].decode(
                    "utf-8", "replace"
                )
            )
        return vals[0] if not dims else vals
    if kind in ("int", "float"):
        arr = np.frombuffer(raw, dtype=_np_dtype(kind, size), count=n)
        return arr.item() if not dims else arr.reshape(dims)
    return raw


def _parse_attribute(data, body):
    ver = body[0]
    if ver != 1:
        raise ValueError(f"attribute message version {ver}")
    name_size = _u(body, 2, 2)
    dt_size = _u(body, 4, 2)
    ds_size = _u(body, 6, 2)
    off = 8
    name = body[off : off + name_size].split(b"\x00", 1)[0].decode()
    off += (name_size + 7) & ~7
    kind, size, meta = _parse_datatype(body[off : off + dt_size])
    off += (dt_size + 7) & ~7
    dims = _parse_dataspace(body[off : off + ds_size])
    off += (ds_size + 7) & ~7
    raw = body[off:]
    return name, _read_attr_value(data, kind, size, meta, dims, raw)


def _object_header_messages(data, addr):
    """Yield (msg_type, body) across continuation blocks (v1 headers)."""
    nmsgs = _u(data, addr + 2, 2)
    hsize = _u(data, addr + 8, 4)
    blocks = [(addr + 16, hsize)]
    count = 0
    while blocks and count < nmsgs:
        boff, bsize = blocks.pop(0)
        pos, end = boff, boff + bsize
        while pos + 8 <= end and count < nmsgs:
            mtype = _u(data, pos, 2)
            msize = _u(data, pos + 2, 2)
            body = data[pos + 8 : pos + 8 + msize]
            if mtype == 0x0010:  # continuation
                blocks.append((_u(body, 0, 8), _u(body, 8, 8)))
            else:
                yield mtype, body
            count += 1
            pos += 8 + msize


def _local_heap_name(data, heap_addr, offset):
    assert data[heap_addr : heap_addr + 4] == b"HEAP"
    data_addr = _u(data, heap_addr + 24, 8)
    end = data.index(b"\x00", data_addr + offset)
    return data[data_addr + offset : end].decode()


def _btree_symbol_entries(data, btree_addr, heap_addr):
    """All (name, object_header_addr) under a v1 group B-tree."""
    out = []

    def walk(addr):
        if addr == UNDEF:
            return
        assert data[addr : addr + 4] == b"TREE", "bad btree signature"
        level = data[addr + 5]
        n = _u(data, addr + 6, 2)
        # keys/children: (n+1) keys, n children; key size 8, child ptr 8
        base = addr + 24
        children = [
            _u(data, base + 8 + i * 16, 8) for i in range(n)
        ]
        if level > 0:
            for c in children:
                walk(c)
            return
        for snod in children:
            assert data[snod : snod + 4] == b"SNOD"
            nsyms = _u(data, snod + 6, 2)
            for i in range(nsyms):
                e = snod + 8 + i * 40
                name_off = _u(data, e, 8)
                ohdr = _u(data, e + 8, 8)
                out.append((_local_heap_name(data, heap_addr, name_off), ohdr))

    walk(btree_addr)
    return out


def _parse_layout(body):
    ver = body[0]
    if ver == 3:
        layout_class = body[1]
        if layout_class == 1:  # contiguous
            addr = _u(body, 2, 8)
            size = _u(body, 10, 8)
            return ("contiguous", addr, size)
        if layout_class == 0:  # compact
            size = _u(body, 2, 2)
            return ("compact", None, body[4 : 4 + size])
        raise ValueError("chunked datasets not supported (Keras files are contiguous)")
    raise ValueError(f"layout version {ver}")


def _read_object(data, addr, path, out):
    attrs = {}
    btree = heap = None
    dt = ds = layout = None
    for mtype, body in _object_header_messages(data, addr):
        if mtype == 0x0011:  # symbol table (it's a group)
            btree, heap = _u(body, 0, 8), _u(body, 8, 8)
        elif mtype == 0x000C:
            try:
                name, val = _parse_attribute(data, body)
                attrs[name] = val
            except Exception as e:  # pragma: no cover - unexpected attr form
                attrs[f"__unparsed_{len(attrs)}"] = repr(e)
        elif mtype == 0x0003:
            dt = _parse_datatype(body)
        elif mtype == 0x0001:
            ds = _parse_dataspace(body)
        elif mtype == 0x0008:
            layout = _parse_layout(body)
    out["attrs"][path or "/"] = attrs
    if btree is not None:
        for name, child in _btree_symbol_entries(data, btree, heap):
            _read_object(data, child, f"{path}/{name}", out)
    elif layout is not None and dt is not None:
        kind, size, _ = dt
        dims = ds or []
        n = int(np.prod(dims)) if dims else 1
        if layout[0] == "contiguous":
            daddr, dsize = layout[1], layout[2]
            if daddr == UNDEF:
                arr = np.zeros(dims, dtype=_np_dtype(kind, size))
            else:
                arr = np.frombuffer(
                    data, dtype=_np_dtype(kind, size), count=n, offset=daddr
                ).reshape(dims)
        else:  # compact
            arr = np.frombuffer(
                layout[2], dtype=_np_dtype(kind, size), count=n
            ).reshape(dims)
        out["datasets"][path] = arr


def read_h5_bytes(data: bytes) -> dict:
    if data[:8] != _SIG or data[8] != 0:
        raise ValueError("not a superblock-v0 HDF5 file")
    root_ohdr = _u(data, 64, 8)
    out = {"attrs": {}, "datasets": {}}
    _read_object(data, root_ohdr, "", out)
    return out


def read_h5(path: str) -> dict:
    return read_h5_bytes(open(path, "rb").read())


# prefixes under which different Keras generations park layer weights:
# legacy full-model h5, Keras-3 zip weights ("_layer_checkpoint_dependencies"
# or "layers"), weights-only files (root)
_LAYER_PREFIXES = ("/model_weights", "/_layer_checkpoint_dependencies", "/layers")


def _weights_from_h5(h5: dict) -> dict:
    root_attrs = h5["attrs"].get("/", {})
    out: dict = {}
    cfg = root_attrs.get("model_config")
    if cfg:
        out["__model_config__"] = cfg
    prefix = ""
    for p in _LAYER_PREFIXES:
        if any(k.startswith(p) for k in h5["datasets"]):
            prefix = p
            break
    for dpath, arr in h5["datasets"].items():
        if not dpath.startswith(prefix):
            continue
        rel = dpath[len(prefix) :].strip("/")
        parts = rel.split("/")
        layer, weight = parts[0], "/".join(parts[1:])
        out.setdefault(layer, {})[weight] = arr
    return out


def keras_weights(path: str) -> dict:
    """Load a Keras model file into {layer: {weight_name: ndarray}} plus
    '__model_config__' (JSON str). Accepts BOTH on-disk formats the
    reference touches (encoder_plugin_vae_small.py:243 saves with
    save_format='keras'):

    - legacy single-file HDF5 (.h5 — also what the shipped golden
      `.h5.keras` files actually are: raw HDF5 despite the extension)
    - modern `.keras` zip: an archive of config.json + metadata.json +
      model.weights.h5, unpacked here with zipfile and parsed by the same
      pure-Python HDF5 reader.
    """
    data = open(path, "rb").read()
    if data[:4] == b"PK\x03\x04":  # zip local-file-header magic
        import io
        import zipfile

        out: dict = {}
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = zf.namelist()
            cfg_name = next((n for n in names if n.endswith("config.json")), None)
            if cfg_name:
                out["__model_config__"] = zf.read(cfg_name).decode("utf-8")
            h5_name = next(
                (n for n in names if n.endswith(".h5") or n.endswith(".weights.h5")),
                None,
            )
            if h5_name is None:
                raise ValueError(f"no weights .h5 member in keras zip {path}")
            parsed = _weights_from_h5(read_h5_bytes(zf.read(h5_name)))
            parsed.pop("__model_config__", None)  # zip config.json wins
            out.update(parsed)
        return out
    return _weights_from_h5(read_h5_bytes(data))


def model_config(path: str) -> dict:
    cfg = keras_weights(path).get("__model_config__")
    return json.loads(cfg) if cfg else {}
