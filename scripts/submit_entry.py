"""spark-submit main file: delegates to the package CLI.

The package itself arrives on the executors via --py-files (see
scripts/submit.sh); this file only needs to be importable on the
driver, where spark-submit places the --py-files zip on sys.path
automatically.
"""

import sys

from search_rs_spark.__main__ import main

if __name__ == "__main__":
    raise SystemExit(main(["search_rs_spark", *sys.argv[1:]]))
