"""Aggregate test results from log.txt files across seed directories.

CLI- and output-compatible with the reference tool
(/root/reference/parse_test_res.py).  The implementation lives in
rpo_tpu/parse_results.py so the installed wheel exposes the same CLI as
the `rpo-tpu-parse-results` console script.
"""
from rpo_tpu.parse_results import main

if __name__ == "__main__":
    main()
