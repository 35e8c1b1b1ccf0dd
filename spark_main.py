"""Thin spark-submit launcher for the engine CLI.

spark-submit takes an application *file*, not a module, so the zero-install
deployment story is: zip the package, ship it with --py-files, and point
spark-submit at this one-file launcher (which itself imports everything from
the shipped zip):

    zip -r engine.zip activity_files_spark
    spark-submit --master <cluster> --py-files engine.zip spark_main.py \\
        tile --images /data/images.parquet --resolutions 8,10,12 \\
        --output /data/tiles --manifest /data/ckpt

Reference: bin/activity_files.dart (the reference's CLI binary); the
spark-submit packaging contract itself is the engine's deployment surface.
"""

import sys

from activity_files_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
