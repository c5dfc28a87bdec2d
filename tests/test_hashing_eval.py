"""Failure-rate evaluation sanity: batched insertion keeps the reference's
success-probability envelope (high slack -> no failures, slack 1.0 with one
hash config -> failures observed)."""

from nested_hashing_psi_tpu.hashing.evaluation import evaluate_flat, evaluate_nested


def test_flat_failure_envelope():
    rows = evaluate_flat(
        n_elem=2048, n_runs=4, stash=0, n_cuckoo_hf=2, items_pp=1,
        slacks=(1.0, 1.4, 2.0),
    )
    by_slack = {r[0]: r[2] for r in rows}
    assert by_slack[1.0] == 4       # slack 1.0, no stash: always fails
    assert by_slack[2.0] == 0       # 2x slack, 2 hash fns: never fails


def test_nested_failure_envelope():
    rows = evaluate_nested(
        n_elem=4096, n_runs=3, each_simple_table_size=32, stash=2,
        n_simple_hf=2, n_cuckoo_hf=2, slacks=(1.2, 1.4),
    )
    assert rows[-1][2] == 0  # generous slack: no failures


def test_stash_rescues_marginal_config():
    no_stash = evaluate_flat(
        n_elem=1024, n_runs=6, stash=0, n_cuckoo_hf=2, items_pp=2,
        slacks=(1.05,),
    )[0][2]
    with_stash = evaluate_flat(
        n_elem=1024, n_runs=6, stash=4, n_cuckoo_hf=2, items_pp=2,
        slacks=(1.05,),
    )[0][2]
    assert with_stash <= no_stash
