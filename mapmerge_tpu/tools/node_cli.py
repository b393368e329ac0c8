"""Online merge node launcher.

Equivalent of the reference's map_merge_node executable + launch files
(src/map_merge_node.cpp:253-267, launch/map_merge.launch,
launch/from_pcds.launch): runs the MapMergeNode over a directory transport
(each `<robot>.pcd` in --watch-dir is a robot's latest published map —
overwrite the file to publish an update), periodically writing the latched
merged map to --output and printing pose updates (the tf-broadcast analog).

Usage:
  python -m mapmerge_tpu.tools.node_cli --watch-dir maps/ \
      [--output merged.pcd] [--compositing-rate 0.3] [--discovery-rate 0.05]
      [--estimation-rate 0.01] [--param value ...]
"""

from __future__ import annotations

import signal
import sys
import time

import numpy as np


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    def opt(name: str, default):
        if name in argv:
            return type(default)(argv[argv.index(name) + 1])
        return default

    watch_dir = opt("--watch-dir", "")
    if not watch_dir:
        print("--watch-dir is required", file=sys.stderr)
        return 1
    output = opt("--output", "merged.pcd")
    rates = dict(
        compositing_rate=opt("--compositing-rate", 0.3),
        discovery_rate=opt("--discovery-rate", 0.05),
        estimation_rate=opt("--estimation-rate", 0.01),
    )
    run_seconds = opt("--run-seconds", 0.0)  # 0 = until SIGINT

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from mapmerge_tpu.core.params import MergeParams
    from mapmerge_tpu.io.pcd import write_pcd
    from mapmerge_tpu.runtime.node import MapMergeNode
    from mapmerge_tpu.runtime.transport import DirectoryTransport

    params = MergeParams.from_command_line(argv)
    print(params)

    def on_pose(robot: str, t: np.ndarray):
        trans = t[:3, 3] if t.any() else None
        print(f"[tf] {robot}: {'FAILED' if trans is None else trans}", flush=True)

    node = MapMergeNode(
        DirectoryTransport(watch_dir),
        params=params,
        pose_callback=on_pose,
        **rates,
    )

    stop = {"flag": False}
    signal.signal(signal.SIGINT, lambda *_: stop.__setitem__("flag", True))
    signal.signal(signal.SIGTERM, lambda *_: stop.__setitem__("flag", True))

    deadline = time.time() + run_seconds if run_seconds else None
    last_stamp = 0.0
    with node:
        print(f"watching {watch_dir} (Ctrl-C to stop)", flush=True)
        while not stop["flag"]:
            if deadline and time.time() > deadline:
                break
            merged = node.get_merged_map()
            stamp = node._merged_stamp
            if merged is not None and stamp > last_stamp:
                xyz, rgb = merged.to_arrays()
                write_pcd(output, (xyz, rgb))
                print(
                    f"[map] wrote {len(xyz)} points -> {output} "
                    f"(robots: {node.get_robots()})",
                    flush=True,
                )
                last_stamp = stamp
            time.sleep(0.5)
    print("node stopped")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
