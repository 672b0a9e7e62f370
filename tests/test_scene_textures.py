"""Scene loading edge cases and the texture sampling path."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from romis_tpu.core.camera import make_camera
from romis_tpu.core.features import Features
from romis_tpu.ops.shading import acquire_texel, diffuse_albedo
from romis_tpu.render.restir import initial_temporal_state, render_restir_frame
from romis_tpu.scene.objloader import load_obj
from romis_tpu.scene.scene import build_geometry, default_data_dir, load_prebuilt


def test_obj_face_formats(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("""
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
f 1 2 3
f 1//1 2//1 3//1
f 1/1/1 2/2/1 3/3/1
f -4 -3 -2 -1
""")
    subs = load_obj(str(p))
    assert len(subs) == 1
    # 3 triangles + 1 quad (fan → 2) = 5 triangles.
    assert len(subs[0].triangles) == 5
    # Normals: either from vn or geometric; all unit.
    np.testing.assert_allclose(
        np.linalg.norm(subs[0].normals, axis=-1), 1.0, rtol=1e-5)


def test_obj_material_split(tmp_path):
    (tmp_path / "m.mtl").write_text("""
newmtl red
Kd 1 0 0
Ns 7
newmtl blue
Kd 0 0 1
Ks 0.5 0.5 0.5
""")
    p = tmp_path / "m.obj"
    p.write_text("""
mtllib m.mtl
v 0 0 0
v 1 0 0
v 0 1 0
usemtl red
f 1 2 3
usemtl blue
f 1 2 3
usemtl red
f 1 2 3
""")
    subs = load_obj(str(p))
    assert [s.material.name for s in subs] == ["red", "blue", "red"]
    assert subs[0].material.kd == (1.0, 0.0, 0.0)
    assert subs[1].material.ks == (0.5, 0.5, 0.5)
    assert subs[0].material.shininess == 7.0


def test_acquire_texel_indexing():
    """texture.cpp:4-9: x = u*(W-1), y = v*(H-1), row-major nearest."""
    tex = np.arange(2 * 3 * 4 * 3, dtype=np.float32).reshape(2, 3, 4, 3)
    tex_size = jnp.asarray([[3, 4], [2, 2]], jnp.int32)
    uv = jnp.asarray([1.0, 0.5]).reshape(2, 1, 1)  # u=1, v=0.5 → x=3, y=1
    tid = jnp.zeros((1, 1), jnp.int32)
    out = np.asarray(acquire_texel(jnp.asarray(tex), tex_size, tid, uv))
    np.testing.assert_allclose(out[:, 0, 0], tex[0, 1, 3])


@pytest.mark.skipif(default_data_dir() is None, reason="no data dir")
def test_cube_textured_scene_renders():
    try:
        import PIL  # noqa: F401
    except ImportError:
        pytest.skip("pillow unavailable for texture decode")
    scene = load_prebuilt("cube_textured")
    has_tex = int(np.asarray(scene.geometry.mat_tex_id).max()) >= 0
    h, w = 24, 24
    cam = make_camera(look_at=(0, 0, 0), rotation_deg=(15, 30, 0),
                      distance=3.0, fov_deg=50, resolution=(h, w))
    feats = Features(spatial_resample_radius=2, initial_light_samples=8)
    prev = initial_temporal_state(h, w, feats.num_samples_in_reservoir, cam)
    img, _ = jax.jit(render_restir_frame, static_argnums=(4, 5, 6, 7))(
        jax.random.PRNGKey(0), cam, scene.geometry, scene.lights,
        scene.num_lights, h, w, feats, prev)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.max() > 0
    if has_tex:
        # Textured and untextured renders must differ.
        feats2 = feats.replace(enable_texture_mapping=False)
        img2, _ = jax.jit(render_restir_frame, static_argnums=(4, 5, 6, 7))(
            jax.random.PRNGKey(0), cam, scene.geometry, scene.lights,
            scene.num_lights, h, w, feats2, prev)
        assert not np.array_equal(img, np.asarray(img2))


@pytest.mark.skipif(default_data_dir() is None, reason="no data dir")
@pytest.mark.parametrize("name", ["monkey", "cornell_box", "cube"])
def test_remaining_prebuilt_scenes_render(name):
    scene = load_prebuilt(name)
    h, w = 16, 16
    cam = make_camera(look_at=(0, 0, 0), rotation_deg=(0, 0, 0),
                      distance=3.0, fov_deg=50, resolution=(h, w))
    feats = Features(spatial_resample_radius=2, initial_light_samples=4)
    prev = initial_temporal_state(h, w, feats.num_samples_in_reservoir, cam)
    img, _ = jax.jit(render_restir_frame, static_argnums=(4, 5, 6, 7))(
        jax.random.PRNGKey(0), cam, scene.geometry, scene.lights,
        scene.num_lights, h, w, feats, prev)
    assert np.isfinite(np.asarray(img)).all()
