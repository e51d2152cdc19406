"""spark-submit entry for one timed validation pass at one parallelism.

    spark-submit --master local[N] --py-files dist/jsonschema_spark.zip \
        scripts/throughput_job.py --cores N --rows 1000000

Prints one JSON line (see jsonschema_spark.cli cmd_throughput).
"""

import sys

from jsonschema_spark.cli import main

sys.exit(main(["throughput"] + sys.argv[1:]))
