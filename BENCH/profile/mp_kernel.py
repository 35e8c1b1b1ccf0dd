import sys, time
sys.path.insert(0, "/root/repo")
import multiprocessing as mp
import numpy as np
from activity_files_spark.data.images import make_image_row, image_index, pixels_for, caption_for
from activity_files_spark.codecs.image import decode, psnr_db, phash64, LOSSLESS_FMTS

N = 40000
def validate_chunk(rng):
    ok = 0
    for i in range(*rng):
        row = make_image_row(i)   # includes encode; decode path below
        px = decode(row["bytes"], row["fmt"])
        ref = pixels_for(i, row["w"], row["h"])
        if row["fmt"] in LOSSLESS_FMTS:
            good = np.array_equal(px, ref)
        else:
            good = psnr_db(px, ref) >= 40.0
        good = good and row["caption"] == caption_for(i) and row["phash"] == phash64(px)
        ok += bool(good)
    return ok

if __name__ == "__main__":
    for n in (4, 16):
        chunks = [(k * N // (n * 8), (k + 1) * N // (n * 8)) for k in range(n * 8)]
        with mp.Pool(n) as p:
            p.map(validate_chunk, chunks[:n])  # warm imports
            t0 = time.monotonic()
            res = p.map(validate_chunk, chunks)
            dt = time.monotonic() - t0
        print(n, "workers:", round(N / dt, 1), "img/s ", round(N / dt / n, 1), "per worker")
