"""Golden-path integration: train-to-overfit then decode reproduces the target.

Validates the full loop the reference system depends on — teacher-forced
training updates actually teach the decoder, and the compiled KV-cached decode
emits what the trained model knows — on a tiny model/example (CPU-friendly).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acai_omr_tpu.data.tokenizer import LmxTokenizer
from acai_omr_tpu.models import omr_decoder, vit_encoder, vitomr as vitomr_lib
from acai_omr_tpu.models.omr_decoder import DecoderConfig
from acai_omr_tpu.models.vit_encoder import EncoderConfig
from acai_omr_tpu.models.vitomr import ViTOMRConfig
from acai_omr_tpu.parallel import trainer


def test_overfit_then_decode(rng):
    tok = LmxTokenizer()
    cfg = ViTOMRConfig(
        encoder=EncoderConfig(patch_size=16, pe_max_height=4, pe_max_width=6,
                              num_layers=2, hidden_dim=32, num_heads=4,
                              mlp_dim=48, dropout=0.0),
        decoder=DecoderConfig.from_tokenizer(tok, max_lmx_seq_len=32,
                                             num_layers=2, hidden_dim=32,
                                             num_heads=4, mlp_dim=48,
                                             dropout=0.0),
        transition_head_dim=48, transition_head_dropout=0.0)
    params = vitomr_lib.init_vitomr_params(jax.random.PRNGKey(0), cfg)

    lmx = "measure time beats:4 beat-type:4 clef:G2 C4 voice:1 quarter D4 quarter E4 quarter rest quarter"
    ids = tok.encode(lmx)
    img = rng.random((1, 48, 80), dtype=np.float32)

    pb = vit_encoder.batchify([img], cfg.encoder, bucket_multiple=8)
    inputs, targets, lmx_valid = omr_decoder.batchify_and_split_lmx_seqs(
        [ids], tok.pad_idx, bucket_multiple=8, max_len=32)
    batch = {k: jnp.asarray(v) for k, v in dict(
        patches=pb.patches, pe_idx=pb.pe_idx, pe_w=pb.pe_w, valid=pb.valid,
        inputs=inputs, targets=targets, lmx_valid=lmx_valid).items()}

    def loss_fn(p, b, r):
        logits = vitomr_lib.forward_teacher_forced(
            p, cfg, b["patches"], b["pe_idx"], b["pe_w"], b["valid"],
            b["inputs"], b["lmx_valid"], compute_dtype=jnp.float32)
        return vitomr_lib.omr_ce_loss(logits, b["targets"], tok.pad_idx), {}

    tx = trainer.adamw(3e-3, weight_decay=0.0)
    state = trainer.create_train_state(params, tx)
    step = trainer.make_train_step(loss_fn, tx, donate=False)

    first_loss = None
    for i in range(150):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert final_loss < 0.05, (first_loss, final_loss)
    assert final_loss < first_loss / 10

    # KV-cached greedy decode reproduces the training sequence exactly
    latent, latent_valid = vitomr_lib.encode_image(
        state.params, cfg, batch["patches"], batch["pe_idx"], batch["pe_w"],
        batch["valid"], compute_dtype=jnp.float32)
    seqs, lps, mask = vitomr_lib.cached_greedy_generate(
        state.params, cfg, latent, latent_valid, max_len=32,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    decoded = np.asarray(seqs)[0][np.asarray(mask)[0]]
    assert tok.decode(decoded) == lmx
