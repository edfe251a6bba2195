#!/bin/bash
# Round-4 TPU job runner, probe-gated: before EVERY job, require a live
# real-computation probe (the axon tunnel flaps — an import-only probe
# lies, and a dead tunnel makes every device op hang forever). While the
# tunnel is dead the single host core goes to the CPU parity run
# (/tmp/parity_r4.pid), which is SIGSTOPped while a TPU job runs so the
# job's host-side compile isn't starved.
set -u
LOG=/tmp/tpu_queue.log
CK=/tmp/r4ckpt
cd /root/repo
mkdir -p "$CK"
# share compiled programs across jobs/retries (tunnel flaps mid-compile
# otherwise throw the work away)
export JAX_COMPILATION_CACHE_DIR=/tmp/pdgn_tpu_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

parity_pid() { cat /tmp/parity_r4.pid 2>/dev/null; }

probe() {
  timeout 120 python - <<'PY' >> /tmp/tpu_watch.log 2>&1
import jax, jax.numpy as jnp, time
t0 = time.time()
x = jnp.ones((256, 256), jnp.bfloat16)
print("alive", float(jnp.sum((x @ x).astype(jnp.float32))),
      round(time.time() - t0, 1), flush=True)
PY
}

wait_tpu() {
  # parity gets the core while we wait
  kill -CONT "$(parity_pid)" 2>/dev/null
  until probe; do
    echo "tunnel dead $(date)" >> "$LOG"
    sleep 180
  done
  touch /tmp/tpu_alive
}

run() { # name timeout_s cmd...
  local name=$1 to=$2; shift 2
  wait_tpu
  kill -STOP "$(parity_pid)" 2>/dev/null
  echo "--- [$name] start $(date)" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "--- [$name] rc=$? $(date)" >> "$LOG"
  kill -CONT "$(parity_pid)" 2>/dev/null
}

# A. Kernel-level measurements (VERDICT #2a + #2b), most valuable first.
run shape_chain 1800 env PDGN_LOCAL_STATS_SELECT=chain \
  python scripts/profile_breakdown.py shape --iters 4
run shape_radix 1800 env PDGN_LOCAL_STATS_SELECT=radix \
  python scripts/profile_breakdown.py shape --iters 4
run train_fp32 2400 python bench.py --child train
run train_radix 2400 env PDGN_LOCAL_STATS_SELECT=radix \
  python bench.py --child train
run train_bf16 2400 python bench.py --child train_bf16
run gbwd_prof 2400 python scripts/profile_breakdown.py gbwd --iters 4
run gfwd_prof 2400 python scripts/profile_breakdown.py gfwd --iters 4
touch /tmp/queue_A_done

# B. Quality seed band (VERDICT #8) — wait for the parity run to free
# the host core.
while kill -0 "$(parity_pid)" 2>/dev/null; do sleep 120; done
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
