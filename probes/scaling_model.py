"""Config-5 8-chip scaling-efficiency model (VERDICT r3 item 8).

Inputs are MEASURED single-chip rates from this round's bench
(BENCH_r04): f32-'highest' matmul peak, HBM BW, and the 125k-row
s=2560 shard factorization (bench kind factor_shard).  ICI is the one
quantity this 1-chip dev rig cannot measure; the v5e spec value
(1600 Gbps/chip aggregate) derated to 75% is used and stated.
"""
MXU = 31.2e12        # measured f32-'highest' matmul FLOP/s (mxu_f32)
HBM = 682e9          # measured bytes/s (hbm_bw)
ICI = 0.75 * 200e9   # v5e 1600 Gbps/chip aggregate, 75% achievable (assumption)
SHARD_T = 0.453      # measured: 125k-row s=2560 chunk factor, s (factor_shard)
S, P, M, B = 2560, 8, 49, 1024
NNZ, N = 5_494_816, 1_000_000

rows = []
def row(name, t_comp, comms, tail=0.0, note=""):
    t_comm = sum(b / ICI for b in comms)
    eff = t_comp / (t_comp + t_comm + tail)
    rows.append((name, t_comp, sum(comms), t_comm, tail, eff, note))

# --- distributed factor (SPIKE v2, sym scan + tips) ---------------------
iface_bytes = 4 * S * S * 4                    # 4 (s,s) tips all_gather
reduced_tail = 7 * 19 * S ** 3 / MXU  # structured reduced factor
#   (quadrant form [[I,B],[C,I]]: one (s,s) inverse + ~8 products
#    per block vs a dense (2s)^3 Thomas step — parallel/banded.py)
row("factor 1M (8 chips)", SHARD_T, [iface_bytes * (P - 1) / P],
    tail=reduced_tail, note="per-chip chunk factor measured on chip")

# --- distributed 1024-RHS solve (recompute variant) ---------------------
sweep_flops = 2 * M * 3 * 2 * S * S * B        # two local sweeps
t_sweeps = sweep_flops / MXU
gath_bytes = 2 * S * B * 4 * (P - 1)           # g-tips all_gather (recv)
red_flops = 7 * 3 * 2 * (2 * S) ** 2 * B / P   # reduced solve, B sharded
z_bytes = (P - 1) * 2 * S * (B // P) * 4 * (P - 1)  # z reassembly gather
row("solve 1M x1024RHS", t_sweeps, [gath_bytes, z_bytes],
    tail=red_flops / MXU, note="reduced solve sharded over RHS columns")

# --- distributed SpMV (ring halo k=1) -----------------------------------
spmv_bytes = (NNZ * 8 + 2 * N * 4) / P          # entries+idx + x,y per chip
t_spmv = spmv_bytes / HBM
halo_bytes = 2 * 2453 * 4                       # 2 directions x bw floats
row("SpMV 1M (ring k=1)", t_spmv, [halo_bytes],
    note="HBM-bound; halo overlapped (counted unoverlapped here)")

print(f"{'op':24s} {'t_comp':>9s} {'comm MB':>8s} {'t_comm':>8s} "
      f"{'tail':>8s} {'eff':>6s}  note")
for name, tc, cb, tcm, tl, eff, note in rows:
    print(f"{name:24s} {tc*1e3:8.2f}ms {cb/1e6:7.1f} {tcm*1e3:7.2f}ms "
          f"{tl*1e3:7.2f}ms {eff*100:5.1f}%  {note}")
