

def test_tp2_analytic_estimates_sane():
    """The analytic TP-2 rows (VERDICT r04 #8): marked analytic, anchored
    to the measured single-chip numbers, and strictly better than them."""
    from interactvlm_tpu.utils.memory import tp2_throughput_estimates

    e = tp2_throughput_estimates()
    assert e["analytic"] is True
    sv, tr = e["serving_13b"], e["training_13b"]
    assert sv["cached_b4_tp2_img_per_s"] > sv["measured_cached_b4_1chip"]
    assert (sv["streaming_b4_tp2_img_per_s"]
            > sv["measured_streaming_b2_1chip"])
    # TP-2 13B training should land near the measured 7B step (the llama
    # share's 1.92x scale-up is mostly bought back by the 1.8x TP gain)
    assert (0.8 * tr["qlora_b2_7b_measured_ms"]
            < tr["qlora_b2_13b_tp2_ms_per_step"]
            < 1.5 * tr["qlora_b2_7b_measured_ms"])
