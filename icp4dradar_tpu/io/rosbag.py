"""Pure-Python ROS1 rosbag (v2.0) reader — no ROS installation required.

Replaces the reference's rosbag ingestion (src/radar_odometry.cpp:244-308:
`rosbag::View` over the IMU, radar PointCloud2, and lidar-GT Odometry
topics) with a dependency-free parser of the ROS1 bag container format and
hand-rolled deserializers for the three message types the pipeline consumes:

- sensor_msgs/PointCloud2 -> numpy column dict (fed to io.formats.adapt_point_records)
- sensor_msgs/Imu         -> ImuSample
- nav_msgs/Odometry       -> OdomSample

Bag format: "#ROSBAG V2.0" magic, then records of
[hlen u32][header][dlen u32][data]; header fields are [len u32]"name=value".
Messages live inside chunk records (op=0x05), compression none, bz2, or
lz4 (roslz4 writes standard LZ4 frames; decoded via ctypes on the system
liblz4 — io/lz4f.py). Connection records (op=0x07) map conn ids to topics.
"""

from __future__ import annotations

import bz2
import os
import struct
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

_OP_MSG = 0x02
_OP_BAGHDR = 0x03
_OP_INDEX = 0x04
_OP_CHUNK = 0x05
_OP_CHUNKINFO = 0x06
_OP_CONNECTION = 0x07

# PointField datatype codes (sensor_msgs/PointField)
_PF_DTYPES = {
    1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16,
    5: np.int32, 6: np.uint32, 7: np.float32, 8: np.float64,
}


def _parse_header(buf: bytes) -> Dict[str, bytes]:
    fields = {}
    off = 0
    while off < len(buf):
        (flen,) = struct.unpack_from("<I", buf, off)
        off += 4
        item = buf[off:off + flen]
        off += flen
        eq = item.index(b"=")
        fields[item[:eq].decode()] = item[eq + 1:]
    return fields


@dataclass
class Connection:
    conn_id: int
    topic: str
    msg_type: str


@dataclass
class ImuSample:
    stamp: float
    angular_velocity: np.ndarray    # (3,)
    linear_acceleration: np.ndarray # (3,)
    orientation: np.ndarray         # (4,) xyzw


@dataclass
class OdomSample:
    stamp: float
    position: np.ndarray            # (3,)
    orientation: np.ndarray         # (4,) xyzw
    frame_id: str = ""
    child_frame_id: str = ""

    def pose_matrix(self) -> np.ndarray:
        import jax.numpy as jnp

        from icp4dradar_tpu.geom.so3 import quat_to_matrix

        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(
            quat_to_matrix(jnp.asarray(self.orientation, dtype=jnp.float32))
        )
        T[:3, 3] = self.position
        return T


@dataclass
class PointCloud2:
    stamp: float
    columns: Dict[str, np.ndarray]  # field name -> (N,) array
    frame_id: str = ""


class _Cursor:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def u8(self):
        v = self.data[self.off]; self.off += 1; return v

    def u32(self):
        (v,) = struct.unpack_from("<I", self.data, self.off); self.off += 4; return v

    def f64(self, n=1):
        v = np.frombuffer(self.data, np.float64, n, self.off)
        self.off += 8 * n
        return v if n > 1 else float(v[0])

    def string(self):
        n = self.u32()
        s = self.data[self.off:self.off + n].decode(errors="replace")
        self.off += n
        return s

    def time(self):
        sec = self.u32(); nsec = self.u32()
        return sec + nsec * 1e-9

    def ros_header(self):
        self.u32()              # seq
        stamp = self.time()
        frame_id = self.string()
        return stamp, frame_id


def _decode_pointcloud2(data: bytes) -> PointCloud2:
    c = _Cursor(data)
    stamp, frame_id = c.ros_header()
    height = c.u32()
    width = c.u32()
    nfields = c.u32()
    fields = []
    for _ in range(nfields):
        name = c.string()
        offset = c.u32()
        datatype = c.u8()
        count = c.u32()
        fields.append((name, offset, datatype, count))
    c.u8()                      # is_bigendian
    point_step = c.u32()
    c.u32()                     # row_step
    nbytes = c.u32()
    raw = np.frombuffer(c.data, np.uint8, nbytes, c.off)
    c.off += nbytes
    n = (height * width)
    n = min(n, len(raw) // max(point_step, 1))
    raw = raw[: n * point_step].reshape(n, point_step)
    columns: Dict[str, np.ndarray] = {}
    for name, offset, datatype, count in fields:
        dt = _PF_DTYPES.get(datatype)
        if dt is None or count != 1:
            continue
        width_b = np.dtype(dt).itemsize
        col = raw[:, offset:offset + width_b].copy().view(dt)[:, 0]
        columns[name] = col.astype(np.float32)
    return PointCloud2(stamp=stamp, columns=columns, frame_id=frame_id)


def _decode_imu(data: bytes) -> ImuSample:
    c = _Cursor(data)
    stamp, _ = c.ros_header()
    orientation = np.asarray(c.f64(4), dtype=np.float32)
    c.f64(9)
    ang = np.asarray(c.f64(3), dtype=np.float32)
    c.f64(9)
    lin = np.asarray(c.f64(3), dtype=np.float32)
    return ImuSample(stamp=stamp, angular_velocity=ang,
                     linear_acceleration=lin, orientation=orientation)


def _decode_odometry(data: bytes) -> OdomSample:
    c = _Cursor(data)
    stamp, frame_id = c.ros_header()
    child = c.string()
    pos = np.asarray(c.f64(3), dtype=np.float32)
    quat = np.asarray(c.f64(4), dtype=np.float32)
    return OdomSample(stamp=stamp, position=pos, orientation=quat,
                      frame_id=frame_id, child_frame_id=child)


_DECODERS = {
    "sensor_msgs/PointCloud2": _decode_pointcloud2,
    "sensor_msgs/Imu": _decode_imu,
    "nav_msgs/Odometry": _decode_odometry,
}


class RosbagReader:
    """Sequential reader over a ROS1 v2.0 bag.

    By default the container layer (record walk, chunk reads, bz2
    decompression) runs in the native prefetching streamer
    (native/bagio.cpp) so IO/decompression overlap message decoding — the
    counterpart of the reference's C++ rosbag::View (radar_odometry.cpp:
    244-308). Falls back to the pure-Python path when the native library
    is unavailable or the bag uses an unsupported compression."""

    def __init__(self, path: str, use_native: bool = True):
        self.path = path
        self.use_native = use_native
        self.connections: Dict[int, Connection] = {}

    def read_messages(
        self, topics: Optional[List[str]] = None
    ) -> Iterator[Tuple[str, object, float]]:
        """Yields (topic, decoded_message, bag_time) in bag order for the
        supported message types (others are skipped)."""
        if self.use_native:
            stream = self._native_stream(topics)
            if stream is not None:
                yield from stream
                return
        yield from self._python_stream(topics)

    def _native_stream(self, topics):
        """Build the native-backed record iterator, or None to fall back
        (decided BEFORE any message is yielded — no duplication)."""
        try:
            from icp4dradar_tpu.native.bagloader import NativeBagStreamer

            streamer = NativeBagStreamer(self.path)
            if not streamer.check_supported():
                streamer.close()
                return None
        except Exception:
            return None

        def gen():
            try:
                for op, header_bytes, data in streamer.records():
                    header = _parse_header(header_bytes)
                    if op == _OP_CONNECTION:
                        self._add_connection(header, data)
                    elif op == _OP_CHUNK:
                        yield from self._read_chunk(data, topics)
            finally:
                streamer.close()

        return gen()

    def _python_stream(
        self, topics: Optional[List[str]] = None
    ) -> Iterator[Tuple[str, object, float]]:
        with open(self.path, "rb") as f:
            magic = f.readline()
            if not magic.startswith(b"#ROSBAG V2.0"):
                raise ValueError(f"not a ROS1 v2.0 bag: {self.path} ({magic[:20]!r})")
            while True:
                rec = self._read_record(f)
                if rec is None:
                    break
                header, data = rec
                op = header.get("op", b"\x00")[0]
                if op == _OP_CONNECTION:
                    self._add_connection(header, data)
                elif op == _OP_CHUNK:
                    comp = header.get("compression", b"none").decode()
                    if comp == "bz2":
                        data = bz2.decompress(data)
                    elif comp == "lz4":
                        from icp4dradar_tpu.io import lz4f

                        (usize,) = struct.unpack(
                            "<I", header.get("size", b"\x00\x00\x00\x00"))
                        data = lz4f.decompress(data, usize)
                    elif comp != "none":
                        raise ValueError(f"unsupported chunk compression: {comp}")
                    yield from self._read_chunk(data, topics)

    def _read_record(self, f):
        lenb = f.read(4)
        if len(lenb) < 4:
            return None
        (hlen,) = struct.unpack("<I", lenb)
        header = _parse_header(f.read(hlen))
        (dlen,) = struct.unpack("<I", f.read(4))
        data = f.read(dlen)
        return header, data

    def _add_connection(self, header, data):
        conn_id = struct.unpack("<I", header["conn"])[0]
        topic = header["topic"].decode()
        dheader = _parse_header(data)
        msg_type = dheader.get("type", b"").decode()
        self.connections[conn_id] = Connection(conn_id, topic, msg_type)

    def _read_chunk(self, data: bytes, topics):
        off = 0
        n = len(data)
        while off + 4 <= n:
            (hlen,) = struct.unpack_from("<I", data, off)
            off += 4
            header = _parse_header(data[off:off + hlen])
            off += hlen
            (dlen,) = struct.unpack_from("<I", data, off)
            off += 4
            payload = data[off:off + dlen]
            off += dlen
            op = header.get("op", b"\x00")[0]
            if op == _OP_CONNECTION:
                self._add_connection(header, payload)
                continue
            if op != _OP_MSG:
                continue
            conn_id = struct.unpack("<I", header["conn"])[0]
            conn = self.connections.get(conn_id)
            if conn is None:
                continue
            if topics is not None and conn.topic not in topics:
                continue
            decoder = _DECODERS.get(conn.msg_type)
            if decoder is None:
                continue
            sec, nsec = struct.unpack("<II", header["time"])
            yield conn.topic, decoder(payload), sec + nsec * 1e-9


# ----------------------------------------------------------------------
# Writer (for tests / converting synthetic sequences into bags)
# ----------------------------------------------------------------------
class RosbagWriter:
    """Minimal uncompressed ROS1 v2.0 bag writer (one chunk, no indexes —
    enough for RosbagReader and for regression fixtures)."""

    def __init__(self, path: str):
        self.path = path
        self._conns: Dict[str, int] = {}
        self._conn_records: List[bytes] = []
        self._messages: List[bytes] = []

    @staticmethod
    def _header(fields: Dict[str, bytes]) -> bytes:
        out = b""
        for k, v in fields.items():
            item = k.encode() + b"=" + v
            out += struct.pack("<I", len(item)) + item
        return out

    @staticmethod
    def _record(header: bytes, data: bytes) -> bytes:
        return (struct.pack("<I", len(header)) + header +
                struct.pack("<I", len(data)) + data)

    def _conn_id(self, topic: str, msg_type: str) -> int:
        if topic not in self._conns:
            cid = len(self._conns)
            self._conns[topic] = cid
            h = self._header({
                "op": b"\x07", "conn": struct.pack("<I", cid),
                "topic": topic.encode(),
            })
            d = self._header({
                "topic": topic.encode(), "type": msg_type.encode(),
                "md5sum": b"0" * 32, "message_definition": b"",
            })
            self._conn_records.append(self._record(h, d))
        return self._conns[topic]

    def _add_msg(self, topic: str, msg_type: str, stamp: float, body: bytes):
        cid = self._conn_id(topic, msg_type)
        sec = int(stamp)
        nsec = int(round((stamp - sec) * 1e9))
        h = self._header({
            "op": b"\x02", "conn": struct.pack("<I", cid),
            "time": struct.pack("<II", sec, nsec),
        })
        self._messages.append(self._record(h, body))

    @staticmethod
    def _ros_header(stamp: float, frame_id: str = "radar") -> bytes:
        sec = int(stamp)
        nsec = int(round((stamp - sec) * 1e9))
        fid = frame_id.encode()
        return (struct.pack("<III", 0, sec, nsec) +
                struct.pack("<I", len(fid)) + fid)

    def add_pointcloud2(self, topic: str, stamp: float,
                        columns: Dict[str, np.ndarray]) -> None:
        names = list(columns.keys())
        n = len(next(iter(columns.values())))
        point_step = 4 * len(names)
        body = self._ros_header(stamp)
        body += struct.pack("<II", 1, n)            # height, width
        body += struct.pack("<I", len(names))
        for i, name in enumerate(names):
            nb = name.encode()
            body += struct.pack("<I", len(nb)) + nb
            body += struct.pack("<IBI", 4 * i, 7, 1)  # offset, f32, count
        body += b"\x00"                              # is_bigendian
        body += struct.pack("<II", point_step, point_step * n)
        raw = np.stack(
            [np.asarray(columns[k], dtype=np.float32) for k in names], -1
        ).tobytes()
        body += struct.pack("<I", len(raw)) + raw
        body += b"\x01"                              # is_dense
        self._add_msg(topic, "sensor_msgs/PointCloud2", stamp, body)

    def add_imu(self, topic: str, stamp: float, ang, lin,
                orientation=(0, 0, 0, 1)) -> None:
        body = self._ros_header(stamp)
        body += np.asarray(orientation, np.float64).tobytes()
        body += np.zeros(9, np.float64).tobytes()
        body += np.asarray(ang, np.float64).tobytes()
        body += np.zeros(9, np.float64).tobytes()
        body += np.asarray(lin, np.float64).tobytes()
        body += np.zeros(9, np.float64).tobytes()
        self._add_msg(topic, "sensor_msgs/Imu", stamp, body)

    def add_odometry(self, topic: str, stamp: float, position,
                     orientation) -> None:
        body = self._ros_header(stamp, frame_id="map")
        child = b"base"
        body += struct.pack("<I", len(child)) + child
        body += np.asarray(position, np.float64).tobytes()
        body += np.asarray(orientation, np.float64).tobytes()
        body += np.zeros(36, np.float64).tobytes()
        body += np.zeros(6, np.float64).tobytes()   # twist
        body += np.zeros(36, np.float64).tobytes()
        self._add_msg(topic, "nav_msgs/Odometry", stamp, body)

    def close(self, compression: str = "none") -> None:
        chunk_data = b"".join(self._conn_records + self._messages)
        raw_len = len(chunk_data)
        if compression == "bz2":
            chunk_data = bz2.compress(chunk_data)
        elif compression == "lz4":
            from icp4dradar_tpu.io import lz4f

            chunk_data = lz4f.compress(chunk_data)
        elif compression != "none":
            raise ValueError(f"unsupported writer compression: {compression}")
        chunk_h = self._header({
            "op": b"\x05", "compression": compression.encode(),
            "size": struct.pack("<I", raw_len),
        })
        with open(self.path, "wb") as f:
            f.write(b"#ROSBAG V2.0\n")
            # bag header record (padded to 4096 like real bags)
            bh = self._header({
                "op": b"\x03",
                "index_pos": struct.pack("<Q", 0),
                "conn_count": struct.pack("<I", len(self._conns)),
                "chunk_count": struct.pack("<I", 1),
            })
            pad = b" " * max(0, 4096 - len(bh) - 8)
            f.write(struct.pack("<I", len(bh)) + bh +
                    struct.pack("<I", len(pad)) + pad)
            f.write(self._record(chunk_h, chunk_data))
            # trailing connection records (what rosbag puts after chunks)
            for rec in self._conn_records:
                f.write(rec)
