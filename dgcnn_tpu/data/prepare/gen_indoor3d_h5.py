"""ETL step 2+3 (reference prepare_data/gen_indoor3d_h5.py +
data_prep_util.save_h5): per-room npys -> normalized 4096-pt 9-ch blocks ->
gzip h5 shards of 1000, with room_filelist.txt / all_files.txt and the
``raw_data3d`` per-block xyz dumps consumed by the sem-seg visualizer.

Rebuilt as a streaming class (no module-global buffer state)."""
from __future__ import annotations

import os
from typing import List

import numpy as np

from dgcnn_tpu.data.prepare.indoor3d import room_to_blocks_normalized

NUM_POINT = 4096
H5_BATCH_SIZE = 1000


class H5ShardWriter:
    """Buffers (block, label) rows and flushes gzip h5 shards of fixed size
    (reference gen_indoor3d_h5.py:43-72 'insert_batch')."""

    def __init__(self, prefix: str, num_point: int = NUM_POINT,
                 shard_size: int = H5_BATCH_SIZE):
        self.prefix = prefix
        self.shard_size = shard_size
        self.data = np.zeros((shard_size, num_point, 9), np.float32)
        self.label = np.zeros((shard_size, num_point), np.uint8)
        self.fill = 0
        self.index = 0
        self.files: List[str] = []

    def _flush(self, count: int) -> None:
        import h5py

        path = f"{self.prefix}_{self.index}.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("data", data=self.data[:count],
                             compression="gzip", compression_opts=4,
                             dtype="float32")
            f.create_dataset("label", data=self.label[:count],
                             compression="gzip", compression_opts=1,
                             dtype="uint8")
        print(f"Stored {path} with size {count}")
        self.files.append(path)
        self.index += 1
        self.fill = 0

    def insert(self, data: np.ndarray, label: np.ndarray) -> None:
        n = data.shape[0]
        start = 0
        while n - start > 0:
            space = self.shard_size - self.fill
            take = min(space, n - start)
            self.data[self.fill:self.fill + take] = data[start:start + take]
            self.label[self.fill:self.fill + take] = label[start:start + take]
            self.fill += take
            start += take
            if self.fill == self.shard_size:
                self._flush(self.shard_size)

    def close(self) -> None:
        if self.fill > 0:
            self._flush(self.fill)


def main(seed: int = 0) -> None:
    from dgcnn_tpu.data.datasets import META_DIR, data_root

    root = data_root()
    in_dir = os.path.join(root, "stanford_indoor3d")
    out_dir = os.path.join(root, "indoor3d_sem_seg_hdf5_data_test")
    os.makedirs(out_dir, exist_ok=True)
    raw_dir = os.path.join(out_dir, "raw_data3d")

    with open(os.path.join(META_DIR, "all_data_label.txt")) as f:
        room_files = [os.path.join(in_dir, ln.rstrip()) for ln in f]

    writer = H5ShardWriter(os.path.join(out_dir, "ply_data_all"))
    rng = np.random.default_rng(seed)
    room_lines: List[str] = []
    raw_index = 0
    total = 0
    for path in room_files:
        print(path)
        data_label = np.load(path)
        blocks, labels = room_to_blocks_normalized(
            data_label, NUM_POINT, rng=rng)
        base = os.path.basename(path)[:-4]          # Area_X_room_Y
        area, room = base[5], base[7:]
        # raw xyz side dumps for the visualizer (indoor3d_util.py:183-210)
        area_dir = os.path.join(raw_dir, f"Area_{area}")
        os.makedirs(area_dir, exist_ok=True)
        for b in range(blocks.shape[0]):
            np.savetxt(
                os.path.join(area_dir, f"{room}({raw_index}).txt"),
                blocks[b, :, 0:3], fmt="%s", delimiter=" ")
            raw_index += 1
            room_lines.append(base)
        total += blocks.shape[0]
        writer.insert(blocks, labels)
    writer.close()
    print(f"Total samples: {total}")

    with open(os.path.join(out_dir, "room_filelist.txt"), "w") as f:
        f.write("\n".join(room_lines) + "\n")
    with open(os.path.join(out_dir, "all_files.txt"), "w") as f:
        for p in writer.files:
            f.write(os.path.join("indoor3d_sem_seg_hdf5_data_test",
                                 os.path.basename(p)) + "\n")


if __name__ == "__main__":
    main()
