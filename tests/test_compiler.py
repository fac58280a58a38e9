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
