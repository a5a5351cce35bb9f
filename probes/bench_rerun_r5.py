"""Focused re-runs: SHT rows (post-fold+unroll), exact geoVI rows
(post flat-primitive VMEM fix), vmapped exact VI row."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import bench_extra as be

t0 = time.time()
for fn in (
    lambda: be.bench_sht(nside=64),
    lambda: be.bench_sht(nside=256),
    lambda: be.bench_sht(nside=512),
    lambda: be.bench_sph_cfm_metric(nside=256),
    lambda: be.bench_geovi_iteration((1024, 1024), None),
    lambda: be.bench_vi_iteration((1280, 1280), None),
    lambda: be.bench_geovi_iteration((4096, 4096), None),
):
    try:
        fn()
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
    if time.time() - t0 > 2700:
        break
