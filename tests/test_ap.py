import numpy as np

from gapartnet_tpu.eval.ap import APEvaluator


def test_perfect_predictions_give_ap_one():
    ev = APEvaluator(num_classes=4)
    # one batch, 2 samples, each with 2 instances; 4 perfect proposals
    isl = np.array([[1, 2], [1, 3]])
    ev.add(
        scores=np.array([0.9, 0.8, 0.95, 0.7]),
        classes=np.array([1, 2, 1, 3]),
        sample_idx=np.array([0, 0, 1, 1]),
        ious=np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.0, 1.0]]),
        instance_sem_labels=isl,
    )
    aps = ev.compute(0.5)
    np.testing.assert_allclose(aps, [1.0, 1.0, 1.0], rtol=1e-6)
    m = ev.compute_map()
    np.testing.assert_allclose([m["AP50"], m["mAP"]], 1.0, rtol=1e-6)


def test_duplicate_match_counts_as_fp():
    ev = APEvaluator(num_classes=3)
    isl = np.array([[1, -1]])
    # two proposals match the same instance; the higher-scored wins
    ev.add(
        scores=np.array([0.9, 0.8]),
        classes=np.array([1, 1]),
        sample_idx=np.array([0, 0]),
        ious=np.array([[0.9, 0.0], [0.8, 0.0]]),
        instance_sem_labels=isl,
    )
    aps = ev.compute(0.5)
    # tp=[1,0], fp=[0,1]; rec=[1,1], prec=[1,0.5] -> AP=1.0 (envelope)
    assert abs(aps[0] - 1.0) < 1e-6
    # with the duplicate scored HIGHER, the true match is the first anyway;
    # now invert: low-iou proposal scored higher
    ev2 = APEvaluator(num_classes=3)
    ev2.add(
        scores=np.array([0.9, 0.8]),
        classes=np.array([1, 1]),
        sample_idx=np.array([0, 0]),
        ious=np.array([[0.3, 0.0], [0.9, 0.0]]),
        instance_sem_labels=isl,
    )
    aps2 = ev2.compute(0.5)
    # first (score .9, iou .3) -> fp; second -> tp
    # rec=[0,1], prec=[0,0.5] -> AP = 0.5
    assert abs(aps2[0] - 0.5) < 1e-6


def test_class_mismatch_is_fp():
    ev = APEvaluator(num_classes=3)
    isl = np.array([[2]])
    ev.add(
        scores=np.array([0.9]),
        classes=np.array([1]),  # wrong class
        sample_idx=np.array([0]),
        ious=np.array([[0.95]]),
        instance_sem_labels=isl,
    )
    aps = ev.compute(0.5)
    assert aps == [0.0, 0.0]


def test_cross_sample_isolation():
    # a proposal in sample 0 cannot match an instance of sample 1
    ev = APEvaluator(num_classes=3)
    isl = np.array([[1], [1]])
    ev.add(
        scores=np.array([0.9, 0.8]),
        classes=np.array([1, 1]),
        sample_idx=np.array([0, 1]),
        ious=np.array([[0.9], [0.9]]),
        instance_sem_labels=isl,
    )
    aps = ev.compute(0.5)
    assert abs(aps[0] - 1.0) < 1e-6  # both match their own sample's instance


def test_map_threshold_sweep():
    ev = APEvaluator(num_classes=2)
    isl = np.array([[1]])
    ev.add(
        scores=np.array([0.9]),
        classes=np.array([1]),
        sample_idx=np.array([0]),
        ious=np.array([[0.7]]),
        instance_sem_labels=isl,
    )
    # matches for thresholds < 0.7 only: 0.5,0.55,0.6,0.65 -> 4/10
    m = ev.compute_map()
    assert abs(m["AP50"] - 1.0) < 1e-6
    assert abs(m["mAP"] - 0.4) < 1e-6
