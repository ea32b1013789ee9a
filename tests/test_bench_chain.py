"""The four-stage workflow-chain harness (bench.py::measure_workflow_chain)
at toy shapes on the CPU mesh.

The TPU artifact for VERDICT r3 #4 (BASELINE.md "Chained four-stage
workflow") runs this exact harness at the flagship 96^3 shape; this test
pins the harness itself — stage ordering, artifact hand-off between CLI
entry points (min-loss checkpoint -> extraction -> classical eval ->
sanity viz), and the per-stage timing dict — so a CLI flag or layout
change cannot silently break the benchmark leg.

Reference journey: /root/reference/README.MD:4-33.
"""

import bench


def test_workflow_chain_tiny_cpu():
    # >= 32 volumes: eval-classical's RandomizedSearchCV runs an inner
    # 5-fold stratified CV on each fold's train features, which needs at
    # least 5 members per class there
    stages = bench.measure_workflow_chain(
        n_volumes=32, epochs=2, volume_size=16, patch_size=4,
        batch_size=4, model="contr_mae_vit_tiny_patch4",
    )
    expected = {
        "chain_prepare_data_s", "chain_pretrain_kfold_s",
        "chain_extract_features_s", "chain_eval_classical_s",
        "chain_sanity_viz_s", "chain_total_s",
    }
    assert set(stages) == expected
    # every stage actually ran (the stage() helper asserts rc == 0; a
    # zero-duration stage would mean a silently skipped CLI call)
    assert all(v > 0 for v in stages.values())
    assert stages["chain_total_s"] >= max(
        v for k, v in stages.items() if k != "chain_total_s"
    )
