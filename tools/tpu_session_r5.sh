#!/bin/bash
# Round-5 tunnel-return runner: execute the TPU-blocked items the moment
# the axon backend answers. Safe to re-run; each stage logs to /tmp.
#
# 1. bench.py         -> /tmp/bench_r5.log   (headline with the r5 kernel
#                        defaults: in-kernel pts everywhere, occ 128x16,
#                        estimator-prefix codec)
# 2. r4 soak          -> /tmp/soak_r5.log    (production-shape validation:
#                        3000x2 occupancy-tuned LSA with i_save renders)
cd /root/repo
set -x
python bench.py 2>&1 | tee /tmp/bench_r5.log
timeout 3000 python tools/demo_synthetic.py --full-mlp --iters 3000 \
  --epochs 2 --occupancy-tuning --i-save 1500 2>&1 | tail -40 | tee /tmp/soak_r5.log
echo TPU_SESSION_R5_DONE
