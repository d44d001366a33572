"""Minimal pure-Python GLTF 2.0 reader.

Replaces the reference's tinygltf dependency
(Source/Engine/Scene/Private/SceneLoader.cpp:371-608).  Supports:

* ASCII .gltf and binary .glb containers
* external .bin buffers and base64 data URIs
* accessors for all GLTF component types (incl. sparse-free common cases)
* meshes/primitives with POSITION/NORMAL/TANGENT/TEXCOORD_0 + indices
* node trees with TRS or matrix transforms
* cameras, materials (pbrMetallicRoughness + alphaMode/doubleSided)
* KHR_lights_punctual (directional/point, SceneLoader.cpp:566-592)
* the reference's `extras` extensions: environment / scene_prefab /
  scene_instance / scene_spawn (SceneLoader.cpp:461-517)

Returns plain dataclasses with numpy arrays; no GPU work happens here.
"""

from __future__ import annotations

import base64
import dataclasses
import json
import struct
from pathlib import Path

import numpy as np

_COMPONENT_DTYPES = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}

_TYPE_COUNTS = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}


@dataclasses.dataclass
class GltfDocument:
    json: dict
    buffers: list[bytes]
    base_dir: Path

    # ---- accessors -------------------------------------------------------

    def accessor(self, index: int) -> np.ndarray:
        """Decode accessor `index` to an (count, components) numpy array."""
        acc = self.json["accessors"][index]
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        ncomp = _TYPE_COUNTS[acc["type"]]
        count = acc["count"]

        if "bufferView" not in acc:
            data = np.zeros((count, ncomp), dtype)
        else:
            view = self.json["bufferViews"][acc["bufferView"]]
            buf = self.buffers[view["buffer"]]
            byte_offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
            stride = view.get("byteStride")
            item_size = np.dtype(dtype).itemsize * ncomp
            if stride is None or stride == item_size:
                data = np.frombuffer(
                    buf, dtype=dtype, count=count * ncomp, offset=byte_offset
                ).reshape(count, ncomp)
            else:
                raw = np.frombuffer(buf, dtype=np.uint8)
                rows = np.lib.stride_tricks.as_strided(
                    raw[byte_offset:], shape=(count, item_size),
                    strides=(stride, 1))
                data = rows.copy().view(dtype).reshape(count, ncomp)

        if "sparse" in acc:
            data = data.copy()
            sparse = acc["sparse"]
            idx = self._sparse_block(
                sparse["indices"], sparse["count"],
                _COMPONENT_DTYPES[sparse["indices"]["componentType"]], 1)
            val = self._sparse_block(sparse["values"], sparse["count"], dtype,
                                     ncomp)
            data[idx[:, 0]] = val
        return data

    def _sparse_block(self, ref: dict, count: int, dtype, ncomp) -> np.ndarray:
        view = self.json["bufferViews"][ref["bufferView"]]
        buf = self.buffers[view["buffer"]]
        offset = view.get("byteOffset", 0) + ref.get("byteOffset", 0)
        return np.frombuffer(buf, dtype=dtype, count=count * ncomp,
                             offset=offset).reshape(count, ncomp)

    def image_path(self, image_index: int) -> Path | None:
        img = self.json["images"][image_index]
        uri = img.get("uri")
        if uri is None or uri.startswith("data:"):
            return None
        return self.base_dir / uri

    def image_bytes(self, image_index: int) -> bytes | None:
        """Raw encoded image bytes for bufferView- or data-URI-backed images."""
        img = self.json["images"][image_index]
        uri = img.get("uri")
        if uri is not None:
            if uri.startswith("data:"):
                return base64.b64decode(uri.split(",", 1)[1])
            return (self.base_dir / uri).read_bytes()
        view = self.json["bufferViews"][img["bufferView"]]
        buf = self.buffers[view["buffer"]]
        offset = view.get("byteOffset", 0)
        return buf[offset:offset + view["byteLength"]]


def _decode_buffer(buffer_def: dict, base_dir: Path,
                   glb_chunk: bytes | None) -> bytes:
    uri = buffer_def.get("uri")
    if uri is None:
        assert glb_chunk is not None, "buffer without uri outside GLB"
        return glb_chunk
    if uri.startswith("data:"):
        return base64.b64decode(uri.split(",", 1)[1])
    buffer_path = base_dir / uri
    if not buffer_path.exists():
        # Name the scene-relative dependency: the reference checkout, for
        # one, ships Sponza.gltf without its Sponza.bin.
        raise FileNotFoundError(
            f"GLTF buffer {uri!r} is missing next to the scene "
            f"(expected {buffer_path}); the geometry cannot be loaded")
    return buffer_path.read_bytes()


def load(path: str | Path) -> GltfDocument:
    path = Path(path)
    data = path.read_bytes()
    glb_chunk = None
    if data[:4] == b"glTF":
        _, _, _ = struct.unpack_from("<III", data, 0)
        offset = 12
        doc = None
        while offset < len(data):
            chunk_len, chunk_type = struct.unpack_from("<II", data, offset)
            chunk = data[offset + 8:offset + 8 + chunk_len]
            if chunk_type == 0x4E4F534A:  # JSON
                doc = json.loads(chunk)
            elif chunk_type == 0x004E4942:  # BIN
                glb_chunk = chunk
            offset += 8 + chunk_len
        assert doc is not None, "GLB missing JSON chunk"
    else:
        doc = json.loads(data)

    buffers = [
        _decode_buffer(b, path.parent, glb_chunk)
        for b in doc.get("buffers", [])
    ]
    return GltfDocument(json=doc, buffers=buffers, base_dir=path.parent)


def node_local_transform(node: dict) -> np.ndarray:
    """4x4 row-major local transform from a GLTF node (matrix or TRS)."""
    if "matrix" in node:
        return np.array(node["matrix"], np.float32).reshape(4, 4).T
    t = np.array(node.get("translation", [0, 0, 0]), np.float32)
    q = np.array(node.get("rotation", [0, 0, 0, 1]), np.float32)  # xyzw
    s = np.array(node.get("scale", [1, 1, 1]), np.float32)
    x, y, z, w = q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = rot * s[None, :]
    m[:3, 3] = t
    return m
