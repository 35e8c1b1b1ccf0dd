import sys, time
sys.path.insert(0, "/root/repo")
import multiprocessing as mp
import numpy as np
from activity_files_spark.data.images import make_image_row, pixels_for, caption_for
from activity_files_spark.codecs.image import decode, psnr_db, phash64, LOSSLESS_FMTS

def validate_chunk(rng):
    ok = 0
    for i in range(*rng):
        row = make_image_row(i)
        px = decode(row["bytes"], row["fmt"])
        ref = pixels_for(i, row["w"], row["h"])
        good = np.array_equal(px, ref) if row["fmt"] in LOSSLESS_FMTS else psnr_db(px, ref) >= 40.0
        ok += bool(good and row["caption"] == caption_for(i) and row["phash"] == phash64(px))
    return ok

if __name__ == "__main__":
    lo, n, workers = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    chunks = [(lo + k * n // (workers * 4), lo + (k + 1) * n // (workers * 4)) for k in range(workers * 4)]
    with mp.Pool(workers) as p:
        p.map(validate_chunk, chunks[:workers])
        t0 = time.monotonic()
        p.map(validate_chunk, chunks)
        print(round(n / (time.monotonic() - t0), 1))
