"""Model-compiler tests: all 64 furniture assets compile to consistent arrays."""

import numpy as np
import pytest

from furniture_tpu.models import compile_model, furniture_names


def test_registry_size():
    # reference ships 62+ furniture XMLs (models/__init__.py:8-21)
    assert len(furniture_names) >= 60


@pytest.fixture(scope="module")
def lack():
    return compile_model("table_lack_0825")


def test_table_lack_structure(lack):
    assert lack.n_parts == 5
    assert lack.n_welds == 4
    assert lack.n_conn == 8
    assert lack.num_connects == 4
    # every leg has allowed angles {0,90,180,270}
    assert lack.conn_has_angles.all()
    np.testing.assert_array_equal(
        lack.conn_angles[0, :4], [0.0, 90.0, 180.0, 270.0]
    )


def test_table_lack_recipe(lack):
    assert len(lack.recipe_site1) == 4
    # recipe references valid conn sites with complementary pair groups
    a1 = lack.conn_pair_a[lack.recipe_site1]
    b1 = lack.conn_pair_b[lack.recipe_site1]
    a2 = lack.conn_pair_a[lack.recipe_site2]
    b2 = lack.conn_pair_b[lack.recipe_site2]
    np.testing.assert_array_equal(a1, b2)
    np.testing.assert_array_equal(b1, a2)


def test_weld_lookup_symmetric(lack):
    W = lack.weld_lookup
    np.testing.assert_array_equal(W, W.T)
    for i in range(lack.n_welds):
        assert W[lack.weld_part1[i], lack.weld_part2[i]] == i


def test_mass_properties_positive(lack):
    assert (lack.part_mass > 0).all()
    for i in range(lack.n_parts):
        eig = np.linalg.eigvalsh(lack.part_inertia[i])
        assert (eig > 0).all()


@pytest.mark.parametrize("name", furniture_names)
def test_all_furniture_compile(name):
    m = compile_model(name)
    assert m.n_parts >= 1
    assert np.isfinite(m.part_init_pos).all()
    assert np.isfinite(m.part_mass).all()
    if m.n_conn:
        assert (m.conn_part < m.n_parts).all()
    if m.n_welds:
        assert (m.weld_part1 < m.n_parts).all()
        assert (m.weld_part2 < m.n_parts).all()


def test_size_scale_resizes_geometry_and_mass():
    """Resize parity: env/furniture.py:1428-1431 (resize_factor rebuild) /
    xml_adjusting/rescale.py — geometry scales linearly, mass cubically."""
    from furniture_tpu.models import compile_model

    base = compile_model("table_lack_0825")
    big = compile_model("table_lack_0825", size_scale=2.0)
    assert np.allclose(big.geom_size, base.geom_size * 2.0)
    assert np.allclose(big.part_init_pos, base.part_init_pos * 2.0)
    assert np.allclose(big.conn_pos, base.conn_pos * 2.0)
    assert np.allclose(big.part_mass, base.part_mass * 8.0, rtol=1e-5)


def test_compile_from_config_size_flags():
    from furniture_tpu.config import EnvConfig
    from furniture_tpu.models import compile_from_config, compile_model

    m = compile_from_config(EnvConfig(furn_size_scale=1.5))
    ref = compile_model("table_lack_0825", size_scale=1.5)
    assert np.allclose(m.geom_size, ref.geom_size)
    # randomized resize stays within 1 +/- r
    m2 = compile_from_config(EnvConfig(furn_size_rand=0.2))
    base = compile_model("table_lack_0825")
    ratio = m2.geom_size[0, 0] / base.geom_size[0, 0]
    assert 0.8 <= ratio <= 1.2
