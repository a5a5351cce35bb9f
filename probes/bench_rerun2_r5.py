"""Round-5 rerun #2: the exact geoVI rows after the batch-fallback
network fix."""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))
import bench_extra as be

be.bench_vi_iteration((1280, 1280), None)
be.bench_geovi_iteration((4096, 4096), None)
