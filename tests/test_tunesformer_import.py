"""TunesFormer torch-checkpoint import: architectural equivalence test.

Builds a torch replica of the reference architecture (GPT2Model patch
decoder over one-hot->Linear embeddings + GPT2LMHeadModel char decoder with
the first input embedding replaced by the encoded patch — the exact
composition in ref tunesformer/utils.py:84-219) from transformers
primitives, converts its state dict, and checks the Flax model reproduces
the torch char-logit outputs. This validates BOTH the import mapping and
this framework's architectural parity with the reference design.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from transformers import GPT2Config, GPT2LMHeadModel, GPT2Model

from ai_music_generation_tpu.models.tunesformer import TunesFormer, TunesFormerConfig
from ai_music_generation_tpu.models.tunesformer_import import (
    params_from_tunesformer_state,
)

P_LEN, P_SIZE, N_EMBD, N_HEAD = 8, 16, 32, 2
PATCH_LAYERS, CHAR_LAYERS = 2, 2


class TorchTunesFormer(torch.nn.Module):
    """Reference-architecture replica from transformers primitives."""

    def __init__(self):
        super().__init__()
        patch_cfg = GPT2Config(
            num_hidden_layers=PATCH_LAYERS, max_length=P_LEN,
            max_position_embeddings=P_LEN, vocab_size=1,
            n_embd=N_EMBD, n_head=N_HEAD,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
        char_cfg = GPT2Config(
            num_hidden_layers=CHAR_LAYERS, max_length=P_SIZE,
            max_position_embeddings=P_SIZE, vocab_size=128,
            n_embd=N_EMBD, n_head=N_HEAD,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )

        class PatchDec(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.patch_embedding = torch.nn.Linear(P_SIZE * 128, N_EMBD)
                self.base = GPT2Model(patch_cfg)

            def forward(self, patches):
                oh = torch.nn.functional.one_hot(patches, num_classes=128).float()
                oh = oh.reshape(len(patches), -1, P_SIZE * 128)
                return self.base(inputs_embeds=self.patch_embedding(oh))

        class CharDec(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.base = GPT2LMHeadModel(char_cfg)

            def forward(self, encoded_patches, target_patches):
                embeds = torch.nn.functional.embedding(
                    target_patches, self.base.transformer.wte.weight
                )
                embeds = torch.cat(
                    (encoded_patches.unsqueeze(1), embeds[:, 1:, :]), dim=1
                )
                return self.base(inputs_embeds=embeds).logits

        self.patch_level_decoder = PatchDec()
        self.char_level_decoder = CharDec()


def test_import_reproduces_torch_forward():
    torch.manual_seed(0)
    ref = TorchTunesFormer().eval()

    rng = np.random.default_rng(0)
    patches = rng.integers(3, 120, size=(1, P_LEN, P_SIZE)).astype(np.int64)
    patches[0, :, 0] = 1  # bos
    with torch.no_grad():
        # reference shape flow: [1, P, S] -> one-hot -> [1, P, S*128] -> GPT2
        enc = ref.patch_level_decoder(
            torch.tensor(patches)
        ).last_hidden_state.squeeze(0)  # [P, N_EMBD]
        torch_logits = ref.char_level_decoder(
            enc[:-1], torch.tensor(patches[0, 1:])
        ).numpy()

    cfg = TunesFormerConfig(
        patch_length=P_LEN, patch_size=P_SIZE,
        patch_layers=PATCH_LAYERS, char_layers=CHAR_LAYERS,
        n_embd=N_EMBD, n_head=N_HEAD, dropout=0.0, dtype=jnp.float32,
    )
    model = TunesFormer(cfg)
    params = params_from_tunesformer_state(dict(ref.state_dict()), cfg)

    jpatches = jnp.asarray(patches, jnp.int32)
    encoded = model.apply(params, jpatches, method=model.encode_patches)
    jax_logits = model.apply(
        params, encoded[0, :-1, :], jpatches[0, 1:], method=model.char_logits
    )
    np.testing.assert_allclose(
        np.asarray(jax_logits), torch_logits, atol=2e-3, rtol=2e-3
    )


def test_import_share_weights_layout():
    """share_weights checkpoints map onto the single shared core."""
    torch.manual_seed(1)
    ref = TorchTunesFormer()
    cfg = TunesFormerConfig(
        patch_length=P_LEN, patch_size=P_SIZE,
        patch_layers=PATCH_LAYERS, char_layers=CHAR_LAYERS,
        n_embd=N_EMBD, n_head=N_HEAD, dropout=0.0, dtype=jnp.float32,
        share_weights=True,
    )
    params = params_from_tunesformer_state(dict(ref.state_dict()), cfg)
    assert "core" in params["params"]
    assert "patch_core" not in params["params"]
