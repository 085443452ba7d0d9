"""spark-submit driver file (north_rule launch path).

    python tools/make_pyfiles_zip.py
    spark-submit --master <cluster> --py-files dist/frontier_engine.zip \
        tools/submit_crawl.py crawl --corpus <pages_parquet> --seeds <seeds> \
        --checkpoint-dir <state_dir> --bloom

spark-submit ships the zip to every executor's PYTHONPATH; this file only
forwards argv to the package CLI (frontier_engine/cli.py).
"""

import sys

from frontier_engine.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
