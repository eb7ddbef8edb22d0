"""Batch-sharded KV-cached decode over the device mesh (SURVEY §2.5(b):
embarrassingly parallel across images, no cross-chip traffic in the hot loop).
Runs on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from acai_omr_tpu.models import decode as decode_lib
from acai_omr_tpu.models import omr_decoder
from acai_omr_tpu.models.omr_decoder import DecoderConfig
from acai_omr_tpu.parallel import mesh as mesh_lib

CFG = DecoderConfig(max_lmx_seq_len=32, vocab_size=31, num_layers=2,
                    hidden_dim=32, num_heads=4, mlp_dim=48, dropout=0.0,
                    pad_idx=1, bos_idx=0, eos_idx=2)


def test_data_sharded_decode_matches_single_device():
    mesh = mesh_lib.make_mesh(8, 1)
    params = omr_decoder.init_decoder_params(jax.random.PRNGKey(0), CFG)
    b, m = 16, 12
    mem = jax.random.normal(jax.random.PRNGKey(1), (b, m, CFG.hidden_dim))
    mem_valid = jnp.ones((b, m), dtype=bool)

    ref_seqs, ref_lps, ref_mask = decode_lib.generate(
        params, CFG, mem, mem_valid, max_len=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)

    # shard the batch over the data axis; params replicated
    data_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    repl = NamedSharding(mesh, P())
    params_s = jax.tree.map(lambda x: jax.device_put(x, repl), params)
    mem_s = jax.device_put(mem, NamedSharding(mesh, P(mesh_lib.DATA_AXIS, None, None)))
    valid_s = jax.device_put(mem_valid, data_sh)

    seqs, lps, mask = decode_lib.generate(
        params_s, CFG, mem_s, valid_s, max_len=16,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)

    n = min(ref_seqs.shape[1], seqs.shape[1])
    np.testing.assert_array_equal(np.asarray(seqs)[:, :n], np.asarray(ref_seqs)[:, :n])
    np.testing.assert_allclose(np.asarray(lps)[:, :n], np.asarray(ref_lps)[:, :n],
                               atol=1e-5)
