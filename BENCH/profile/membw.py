import multiprocessing as mp, time
import numpy as np

def stream(n_iters):
    a = np.empty(64 * 1024 * 1024, dtype=np.uint8)  # 64MB
    b = np.empty_like(a)
    t0 = time.monotonic()
    for _ in range(n_iters):
        np.copyto(b, a)
    dt = time.monotonic() - t0
    return 2 * 64 * n_iters / 1024.0 / dt  # GB/s read+write

if __name__ == "__main__":
    for workers in (1, 3, 12, 16):
        with mp.Pool(workers) as p:
            res = p.map(stream, [12] * workers)
        print(f"{workers:2d} concurrent copiers: aggregate {sum(res):6.1f} GB/s  per-worker {sum(res)/workers:5.1f}")
