"""spark-submit shim: spark-submit --py-files pxs.zip run_job.py <mode> ..."""
from peakmatch_xcorr_spark.__main__ import main

if __name__ == "__main__":
    main()
