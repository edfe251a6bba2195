#!/bin/bash
# Round-4 TPU job runner: waits for the tunnel (flag file from
# /tmp/tpu_watch.sh), then runs the measurement queue. Heavy quality
# trainings wait for the CPU parity run (single host core).
set -u
LOG=/tmp/tpu_queue.log
CK=/tmp/r4ckpt
cd /root/repo
mkdir -p "$CK"

run() { # name timeout_s cmd...
  local name=$1 to=$2; shift 2
  echo "--- [$name] start $(date)" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "--- [$name] rc=$? $(date)" >> "$LOG"
}

while [ ! -f /tmp/tpu_alive ]; do sleep 60; done
echo "=== tunnel alive, queue start $(date)" >> "$LOG"

# A. Kernel-level measurements (VERDICT #2a + #2b)
run shape_chain 2400 env PDGN_LOCAL_STATS_SELECT=chain \
  python scripts/profile_breakdown.py shape --iters 4
run shape_radix 2400 env PDGN_LOCAL_STATS_SELECT=radix \
  python scripts/profile_breakdown.py shape --iters 4
run gfwd_prof 2400 python scripts/profile_breakdown.py gfwd --iters 4
run gbwd_prof 3600 python scripts/profile_breakdown.py gbwd --iters 4
run train_fp32 3600 python bench.py --child train
run train_bf16 2400 python bench.py --child train_bf16
touch /tmp/queue_A_done

# B. Quality seed band (VERDICT #8) — wait for the parity run to free
# the host core.
while kill -0 "$(cat /tmp/parity_r4.pid)" 2>/dev/null; do sleep 120; done
echo "=== parity done, part B start $(date)" >> "$LOG"
for tag in fp32c fp32d; do
  run seed_${tag}_train 4800 python main.py --network PDGNet_v2 \
    --phase train --dataset synthetic --synthetic_size 256 \
    --batch_size 35 --max_epoch 300 --snapshot 300 \
    --model_dir r4$tag --checkpoint_dir "$CK"
  run seed_${tag}_test 1800 python main.py --network PDGNet_v2 \
    --phase test --dataset synthetic --synthetic_size 64 --batch_size 32 \
    --model_dir r4$tag --checkpoint_dir "$CK" \
    --pretrain_model_G 300_full_G.msgpack \
    --pretrain_model_D 300_full_D.msgpack --save_dir "$CK/eval_$tag"
done
run seed_bf16b_train 4800 python main.py --network PDGNet_v2 \
  --phase train --dataset synthetic --synthetic_size 256 \
  --batch_size 35 --max_epoch 300 --snapshot 300 \
  --compute_dtype bfloat16 --model_dir r4bf16b --checkpoint_dir "$CK"
run seed_bf16b_test 1800 python main.py --network PDGNet_v2 \
  --phase test --dataset synthetic --synthetic_size 64 --batch_size 32 \
  --model_dir r4bf16b --checkpoint_dir "$CK" \
  --pretrain_model_G 300_full_G.msgpack \
  --pretrain_model_D 300_full_D.msgpack --save_dir "$CK/eval_bf16b"
touch /tmp/queue_B_done

# C. Full bench record.
run bench_full 10800 python bench.py
echo "=== queue done $(date)" >> "$LOG"
touch /tmp/queue_done
