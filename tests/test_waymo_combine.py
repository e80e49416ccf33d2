"""Waymo combine-group equivalence (VERDICT round 1, weak #6).

The waymo-N TRAIN mode pre-resolves positional combine groups on the host
(training/view_select.py:94-121) so the per-step random timestep permutation
stays traced (no recompiles).  The reference instead resolves groups from
actual id VALUES at encode time (models/bts/model/models_bts.py:93-107 —
mirrored exactly by bts._resolve_combine).  These tests prove, on concrete
permutations, that the positional shortcut is equivalent:

  1. structurally — same group sets, identical encoder group;
  2. value-level — encode+query outputs under both specs are identical up to
     the group-order permutation (the combined axis is reduced with amin in
     the reconstruction loss, so group order cannot affect any loss value).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from behindthescenes_tpu.models.bts import BTSNet, _resolve_combine
from behindthescenes_tpu.training.view_select import select_views


@pytest.mark.parametrize("seed", [0, 1, 7])
@pytest.mark.parametrize("v,num_views", [(12, 3), (18, 3)])
def test_positional_groups_equal_reference_resolution(seed, v, num_views):
    rng = np.random.default_rng(seed)
    ids = select_views(rng, v, [0, 1], f"waymo-{num_views}", training=True)
    assert ids.combine_encoder is not None and ids.combine_render is not None

    comb_e_ref, comb_r_ref = _resolve_combine(
        ids.combine_ids, v, ids.ids_encoder, ids.ids_render)

    # Encoder group identical (the timestep-0 group is first in combine_ids
    # and is the only one intersecting ids_encoder = [0, steps, 2*steps]).
    assert tuple(ids.combine_encoder) == tuple(comb_e_ref)

    # Render groups: same SET of position tuples.  Order differs (reference:
    # ascending timestep; positional: permutation order) — see value test.
    assert {tuple(sorted(g)) for g in ids.combine_render} == \
           {tuple(sorted(g)) for g in comb_r_ref}

    # Each group resolves to one timestep across the three cameras.
    steps = v // num_views
    for g in ids.combine_render:
        absg = sorted(int(ids.ids_render[p]) for p in g)
        assert absg == [absg[0], absg[0] + steps, absg[0] + 2 * steps]


def test_query_values_match_reference_grouping():
    v, h, w = 12, 16, 24
    steps = v // 3
    rng = np.random.default_rng(3)
    ids = select_views(rng, v, [0, 1], "waymo-3", training=True)
    # sanity: this seed's permutation is NOT sorted (order actually differs)
    kept = [int(ids.ids_render[3 * k]) for k in
            range(len(ids.combine_render))]
    assert kept != sorted(kept), kept

    net = BTSNet.from_conf({
        "z_near": 1.0, "z_far": 40.0, "inv_z": True, "learn_empty": False,
        "code": {"num_freqs": 4, "freq_factor": 1.5},
        "encoder": {"type": "dummy", "size": (h, w), "d_out": 16},
        "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 32},
        "mlp_fine": {"type": "empty"},
    })
    images = jnp.asarray(rng.uniform(-1, 1, (1, v, h, w, 3)),
                         dtype=jnp.float32)
    poses = np.broadcast_to(np.eye(4), (1, v, 4, 4)).copy()
    poses[0, :, 0, 3] = np.linspace(-1, 1, v)        # spread along x
    poses = jnp.asarray(poses, dtype=jnp.float32)
    projs = jnp.broadcast_to(jnp.asarray(
        [[0.8, 0, 0], [0, 1.2, 0], [0, 0, 1]], dtype=jnp.float32),
        (1, v, 3, 3))
    variables = net.init(jax.random.PRNGKey(0), images, projs, poses,
                         jnp.zeros((1, 8, 3)))

    def enc(**kw):
        return net.apply(variables, images, projs, poses,
                         ids_encoder=[int(i) for i in ids.ids_encoder],
                         ids_render=[int(i) for i in ids.ids_render],
                         method=BTSNet.encode, **kw)

    grid_pos = enc(combine_encoder=ids.combine_encoder,
                   combine_render=ids.combine_render)
    grid_ref = enc(combine_ids=ids.combine_ids)

    pts = jnp.asarray(
        rng.uniform(-1, 1, (1, 200, 3)) * np.array([3, 1, 1])
        + np.array([0, 0, 4.0]), dtype=jnp.float32)

    def q(grid):
        rgb, invalid, sigma = net.apply(variables, grid, pts,
                                        method=BTSNet.query)
        g = invalid.shape[-1]
        return (np.asarray(rgb).reshape(1, -1, g, 3),
                np.asarray(invalid), np.asarray(sigma))

    rgb_p, inv_p, sig_p = q(grid_pos)
    rgb_r, inv_r, sig_r = q(grid_ref)

    # Density uses only the (identical) encoder group: must match exactly.
    np.testing.assert_array_equal(sig_p, sig_r)

    # Color/invalid: identical per group after aligning group order.
    perm = [grid_ref.c_combine.index(g) for g in grid_pos.c_combine]
    assert sorted(perm) == list(range(len(perm)))
    np.testing.assert_array_equal(rgb_p, rgb_r[:, :, perm])
    np.testing.assert_array_equal(inv_p, inv_r[:, :, perm])

    # The loss reduces the group axis with amin -> order-invariant.
    err_p = np.abs(rgb_p - 0.5).sum(-1) + inv_p * 1e3
    err_r = np.abs(rgb_r - 0.5).sum(-1) + inv_r * 1e3
    np.testing.assert_array_equal(err_p.min(-1), err_r.min(-1))
