"""Side-effect sinks beyond Parquet.

``write_mvt_files``: one ``.mvt`` file per tile in the standard XYZ
tile-server layout ``<root>/<z>/<x>/<y>.mvt`` — the reference's
file-per-tile consumption shape (its fixtures are exactly such files,
/root/reference/test/*.mvt). Implemented as a map_batches consumer:
each task writes its own blocks' tiles (atomic tmp+rename per file, a
partial re-run can only overwrite with identical content), and the
pipeline stays streaming — the driver only ever sees per-batch write
counts, never tile bytes.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray
import ray.data


def write_mvt_files(tiles: ray.data.Dataset, root: str) -> ray.data.Dataset:
    """Write every {z,x,y,mvt} row to <root>/<z>/<x>/<y>.mvt.
    Returns the per-file inventory dataset (z, x, y, n_bytes) so the
    write doubles as a verifiable manifest."""
    def write_batch(b: pa.Table) -> pa.Table:
        z = b["z"].to_numpy()
        x = b["x"].to_numpy()
        y = b["y"].to_numpy()
        mvt = b["mvt"]
        n_bytes = []
        for i in range(b.num_rows):
            d = os.path.join(root, str(int(z[i])), str(int(x[i])))
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{int(y[i])}.mvt")
            data = mvt[i].as_py()
            tmp = f"{path}.tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)  # atomic publish per tile
            n_bytes.append(len(data))
        return pa.table({
            "z": pa.array(z.astype("int64"), pa.int64()),
            "x": pa.array(x.astype("int64"), pa.int64()),
            "y": pa.array(y.astype("int64"), pa.int64()),
            "n_bytes": pa.array(n_bytes, pa.int64()),
        })

    return tiles.map_batches(write_batch, batch_format="pyarrow")
