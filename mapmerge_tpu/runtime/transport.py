"""Pluggable map transport.

The reference's distribution layer is ROS pub/sub: each robot publishes its
map as a PointCloud2 topic, discovered by name pattern
(map_merge_node.cpp:57-100,189-208). Here transport is an interface:

  - InProcTransport: robots are registered programmatically and push
    clouds; the node polls for newly appeared robots (discovery) and
    fetches each robot's latest cloud (the subscription callback analog).
  - DirectoryTransport: watches a directory for `<robot>/map.pcd` files —
    the headless analog of the reference's from_pcds.launch replay fixture
    (launch/from_pcds.launch:1-18).

All methods are thread-safe; `latest()` hands out an immutable snapshot
(the reference's per-subscription mutex pattern, map_merge_node.h:35-40).
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import numpy as np


class Transport:
    """Interface: discovery + latest-map fetch."""

    def discover(self) -> list[str]:
        """Names of all currently known robots."""
        raise NotImplementedError

    def latest(self, robot: str):
        """Latest (version, xyz, rgb) for `robot`, or None."""
        raise NotImplementedError


class InProcTransport(Transport):
    def __init__(self):
        self._lock = threading.Lock()
        self._maps: dict[str, tuple[int, np.ndarray, Optional[np.ndarray]]] = {}

    def publish(self, robot: str, xyz: np.ndarray, rgb=None) -> None:
        """Robot-side: publish a new full map (reference robots republish
        their whole map each time, doc/wiki.txt:12-14)."""
        xyz = np.asarray(xyz, np.float32)
        with self._lock:
            version = self._maps.get(robot, (0, None, None))[0] + 1
            self._maps[robot] = (version, xyz, rgb)

    def discover(self) -> list[str]:
        with self._lock:
            return sorted(self._maps)

    def latest(self, robot: str):
        with self._lock:
            return self._maps.get(robot)


class DirectoryTransport(Transport):
    """Watches `root/<robot>.pcd` (or `root/<robot>/map.pcd`) files."""

    def __init__(self, root: str):
        self.root = root

    def _paths(self) -> dict[str, str]:
        out = {}
        if not os.path.isdir(self.root):
            return out
        for entry in sorted(os.listdir(self.root)):
            full = os.path.join(self.root, entry)
            if entry.endswith(".pcd") and os.path.isfile(full):
                out[entry[:-4]] = full
            elif os.path.isdir(full):
                mp = os.path.join(full, "map.pcd")
                if os.path.isfile(mp):
                    out[entry] = mp
        return out

    def discover(self) -> list[str]:
        return sorted(self._paths())

    def latest(self, robot: str):
        path = self._paths().get(robot)
        if path is None:
            return None
        from mapmerge_tpu.io.pcd import read_pcd_arrays

        version = int(os.stat(path).st_mtime_ns)
        xyz, rgb = read_pcd_arrays(path)
        return version, xyz, rgb
