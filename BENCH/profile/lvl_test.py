import os, sys, time
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
import bench
cpus = int(sys.argv[1])
spark = bench._spark(cpus)
path = bench._images_parquet(spark, 12000, cpus, dims=bench.BIG_DIMS, tag="big")
spark.conf.set("spark.sql.files.maxPartitionBytes", str(bench._tuned_split_bytes(path, cpus)))
bench._warm_python_workers(spark, cpus)
best = 1e9
for i in range(4):
    t0 = time.monotonic()
    bench._noop_write(bench._fused_pipeline_df(spark, path, 0, 12000))
    best = min(best, time.monotonic() - t0)
print(f"local[{cpus}] best: {12000/best:.0f} img/s ({best:.2f}s)")
spark.stop()
