import numpy as np

from gapartnet_tpu.utils import visu


def test_projection_roundtrip():
    # a point at z=2 on the optical axis lands at the image center
    pts = np.array([[0.0, 0.0, 2.0], [0.1, -0.05, 2.0]])
    y, x = visu.project_points(pts)
    assert (y[0], x[0]) == (400, 400)
    assert x[1] == round(0.1 * visu.FOCAL / 2.0 + 400)
    assert y[1] == round(-0.05 * visu.FOCAL / 2.0 + 400)


def test_projection_with_trans():
    pts = np.array([[0.0, 0.0, 1.0]])
    trans = np.array([2.0, 0.0, 0.0, 0.5])  # scale 2, shift z +0.5
    y, x = visu.project_points(pts, trans)
    assert (y[0], x[0]) == (400, 400)


def test_map2image_splats(rng):
    pts = np.array([[0.0, 0.0, 2.0]])
    rgb = np.array([[255, 0, 0]], np.uint8)
    img = visu.map2image(pts, rgb)
    assert img.shape == (800, 800, 3)
    np.testing.assert_array_equal(img[400, 400], [255, 0, 0])
    np.testing.assert_array_equal(img[401, 401], [255, 0, 0])
    assert (img[0, 0] == 255).all()  # background stays white


def test_colorize():
    sem = np.array([0, 1, 2, 0])
    c = visu.colorize_sem(sem)
    np.testing.assert_array_equal(c[0], visu.OTHER_COLOR)
    np.testing.assert_array_equal(c[1], visu.COLOR20[0])
    npcs = np.array([[0.5, 1.0, 0.0]])
    cn = visu.colorize_npcs(npcs)
    np.testing.assert_array_equal(cn[0], [127, 255, 0])


def test_visualize_gapartnet_writes_panels(tmp_path, rng):
    n = 200
    pts = np.concatenate(
        [rng.rand(n, 3) * 0.2 + [0, 0, 2.0], rng.rand(n, 3)], axis=1
    ).astype(np.float32)
    sem = rng.randint(0, 10, n)
    ins = rng.randint(0, 4, n)
    npcs = rng.rand(n, 3).astype(np.float32)
    bbox = np.array(
        [[-1, -1, 1.8], [1, -1, 1.8], [-1, 1, 1.8], [-1, -1, 2.2],
         [1, 1, 1.8], [1, -1, 2.2], [-1, 1, 2.2], [1, 1, 2.2]], np.float32
    ) * 0.1 + [0, 0, 2.0 * 0]
    bbox[:, 2] += 2.0
    panels = visu.visualize_gapartnet(
        save_root=str(tmp_path), name="t", split="test",
        points=pts, sem_preds=sem, ins_preds=ins, npcs_preds=npcs,
        bboxes=[bbox],
        save_option=("pc", "sem_pred", "ins_pred", "npcs_pred", "bbox_pred"),
    )
    assert set(panels) == {"pc", "sem_pred", "ins_pred", "npcs_pred", "bbox_pred"}
    for opt in panels:
        assert (tmp_path / "test" / opt / "t.png").exists()


def test_visualize_gapartnet_full_panel_set(tmp_path, rng):
    """The reference's 12-panel option list (misc/visu.py:66-251): raw RGB,
    pure-bbox panels, and the labeled grid composite."""
    n = 150
    pts = np.concatenate(
        [rng.rand(n, 3) * 0.2 + [0, 0, 2.0], rng.rand(n, 3)], axis=1
    ).astype(np.float32)
    sem = rng.randint(0, 10, n)
    ins = rng.randint(0, 4, n)
    npcs = rng.rand(n, 3).astype(np.float32)
    bbox = np.array(
        [[-1, -1, -1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1],
         [1, 1, -1], [1, -1, 1], [-1, 1, 1], [1, 1, 1]], np.float32
    ) * 0.1 + [0, 0, 2.0]
    raw = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    panels = visu.visualize_gapartnet(
        save_root=str(tmp_path), name="t", split="val",
        points=pts, sem_preds=sem, ins_preds=ins, npcs_preds=npcs,
        bboxes=[bbox], sem_gt=sem, ins_gt=ins - 1, npcs_gt=npcs - 0.5,
        gt_bboxes=[bbox], raw_img=raw,
    )
    assert set(panels) == set(visu.ALL_SAVE_OPTIONS)
    assert panels["raw"].shape == (visu.HEIGHT, visu.WIDTH, 3)  # resized
    # composite grid written at the split root
    assert (tmp_path / "val" / "t.png").exists()
    # raw lookup via raw_img_root (reference RAW_IMG_ROOT mechanism)
    import cv2

    root = tmp_path / "raws"
    root.mkdir()
    cv2.imwrite(str(root / "t2.png"), raw)
    panels2 = visu.visualize_gapartnet(
        save_root=str(tmp_path), name="t2", split="val", points=pts,
        save_option=("raw", "pc"), raw_img_root=str(root),
    )
    assert "raw" in panels2
