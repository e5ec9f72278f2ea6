"""The clean-window gate that decides which records enter the headline
medians — side-blind storm exclusion (bench.py _record_is_clean)."""

import bench


def _rec(canaries, input_sys=5.0, pyscan_sys=5.0, ref_sys=1.0, user=11.0):
    return {
        "host_canary_s": canaries,
        "input_core_s_per_gib_xl": user + input_sys,
        "input_user_core_s_per_gib_xl": user,
        "pyscan_core_s_per_gib_xl": user + pyscan_sys,
        "pyscan_user_core_s_per_gib_xl": user,
        "ref_core_s_per_gib_xl": user + ref_sys,
        "ref_user_core_s_per_gib_xl": user,
    }


def test_clean_record_passes():
    assert bench._record_is_clean(_rec([0.5, 1.2, 2.0], input_sys=30.0))


def test_endpoint_canary_storm_rejected():
    assert not bench._record_is_clean(_rec([0.5, 9.0]))


def test_mid_canary_storm_rejected():
    assert not bench._record_is_clean(_rec([0.5, 12.0, 0.6]))


def test_hidden_storm_rejected_by_sys_cpu_even_with_clean_canaries():
    # the r5 window-1 shape: clean endpoint canaries, input leg faulting
    assert not bench._record_is_clean(_rec([0.8, 1.4], input_sys=111.7))
    # the r4 window-5 shape (the round-4 cherry-pick): input 218 sys
    assert not bench._record_is_clean(_rec([0.7, 2.7], input_sys=218.5))


def test_gate_is_per_leg():
    assert not bench._record_is_clean(_rec([1.0], pyscan_sys=41.0))
    assert not bench._record_is_clean(_rec([1.0], ref_sys=13.0))
    assert bench._record_is_clean(_rec([1.0], pyscan_sys=39.0, ref_sys=11.0))


def test_missing_cpu_keys_fall_back_to_canaries_only():
    assert bench._record_is_clean({"host_canary_s": [1.0, 2.0]})
    assert not bench._record_is_clean({"host_canary_s": [1.0, 9.5]})
    assert not bench._record_is_clean({})
