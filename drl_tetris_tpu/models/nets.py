"""Network family: residual tower + keyboard-conv action head + dueling
value streams, as flax modules.

Faithful port of the reference TF1 graph builders:
  residual_block / keyboard_conv   agents/networks/builders/build_blocks.py:8-83
  resblock / resblock_kbd          agents/networks/builders/sventon_architectures.py:23-73
  visual pad / stack, peephole,
  advantage normalization, softmax agents/networks/network_utils.py

Inputs (the 'separate' unpacker layout, state_unpack.py / sventon_agent_base
.py:52-59): per perspective i in {me, opponent}:
  vec[i]: (B, 12) scalars, vis[i]: (B, H, W, 1) binary field.
Outputs:
  PPO ('ppo'):  pi (B, 4, W, 7) spatial policy (softmax over r,t per piece),
                v  (B, 7) per-piece state value in [-1, 1] (tanh).
  DQN ('dqn'):  Q (B, 4, W, 7), V (B, 1), A (B, 4, W, 7).

Replicated quirks: the peephole join semantics (network_utils.py:52-64);
normalization only ever applies on a truncate_add output layer
(build_blocks.py:28-40 — the 'layer' normalization setting is inert for the
default tower, faithfully); keyboard conv kernel initialized to zeros with
~1e-5 bias noise (build_blocks.py:76-77).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Utility layers (network_utils.py)
# ---------------------------------------------------------------------------


def apply_visual_pad(x):
    """Zero-pad the ceiling, one-pad walls & floor (network_utils.py:71-77):
    floor/walls look like filled cells, ceiling like free space."""
    x = jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)), constant_values=0.0)
    x = jnp.pad(x, ((0, 0), (0, 1), (1, 1), (0, 0)), constant_values=1.0)
    return x


def visual_stack(x, items: Sequence[str]):
    """Feature planes derived from the field (network_utils.py:79-93)."""
    cumsum = jnp.cumsum(x, axis=1)
    shadow = jnp.minimum(cumsum, 1.0)
    height = jnp.broadcast_to(
        jnp.arange(x.shape[1], dtype=x.dtype).reshape(1, -1, 1, 1), x.shape)
    holes = shadow - x
    table = {"cumsum": cumsum, "shadow": shadow, "height": height, "holes": holes}
    return jnp.concatenate([x] + [table[k] for k in items], axis=3)


def peephole_join(x, y, mode="concat"):
    """network_utils.py:52-64."""
    if mode in ("add", "truncate_add"):
        nx, ny = x.shape[3], y.shape[3]
        larger, smaller = (x, y) if nx > ny else (y, x)
        a = larger[:, :, :, : smaller.shape[3]] + smaller
        b = larger[:, :, :, smaller.shape[3]:]
        return jnp.concatenate([a, b], axis=-1) if mode == "add" else a
    return jnp.concatenate([x, y], axis=-1)


def conv_shape_vector(vec, h, w):
    """Tile a (B, K) vector into (B, h, w, K) feature planes
    (network_utils.py:37-44)."""
    return jnp.broadcast_to(vec[:, None, None, :], (vec.shape[0], h, w, vec.shape[1]))


def action_softmax(x):
    """Softmax over the (rotation, translation) plane per piece
    (network_utils.py:120-125).  x: (B, R, T, P)."""
    m = jnp.max(x, axis=(1, 2), keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=(1, 2), keepdims=True)


def action_entropy(pi, eps=1e-6):
    """network_utils.py:114-118: entropy over (r, t) per piece."""
    logp = jnp.log(jnp.maximum(eps, pi))
    return -jnp.sum(pi * logp, axis=(1, 2), keepdims=True)


def normalize_advantages(a, piece_mask=None, mode="mean",
                         separate_piece_values=True, activation=None):
    """Dueling normalization over the action plane (network_utils.py:8-35).
    a: (B, R, T, P)."""
    n_used = 7.0 if piece_mask is None else jnp.sum(piece_mask)
    mask = 1.0 if piece_mask is None else piece_mask.reshape(1, 1, 1, -1)
    if mode == "max":
        all_min = jnp.min(a, axis=(1, 2, 3), keepdims=True)
        am = mask * a + (1.0 - mask) * all_min
        mx = jnp.max(am, axis=(1, 2), keepdims=True)
        if not separate_piece_values:
            mx = jnp.sum(mx * mask, axis=3, keepdims=True) / n_used
        a = a - mx
    elif mode == "mean":
        mean = jnp.mean(a, axis=(1, 2), keepdims=True)
        mean = jnp.sum(mean * mask, axis=3, keepdims=True) / n_used
        a = a - mean
    if activation is not None:
        a = activation(a)
    return a


def q_to_v(q, piece_mask=None):
    """network_utils.py:95-98."""
    n_used = 7.0 if piece_mask is None else jnp.sum(piece_mask)
    mask = 1.0 if piece_mask is None else piece_mask.reshape(1, 1, 1, -1)
    qp = jnp.max(q, axis=(1, 2), keepdims=True)
    v = jnp.sum(qp * mask, axis=3, keepdims=True) / n_used
    return v.reshape(-1, 1)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

_rn_init = nn.initializers.normal(0.01)


class ResidualBlock(nn.Module):
    """build_blocks.py:8-64, layer for layer."""
    dtype: object = None          # compute dtype (None = float32)
    n_layers: int = 3
    n_filters: int = 128
    filter_size: Tuple[int, int] = (3, 3)
    peepholes: bool = True
    pools: bool = False
    pool_size: Tuple[int, int] = (3, 2)
    output_n_filters: Optional[int] = None
    output_activation: Optional[str] = "elu"
    normalization: Optional[str] = None
    output_layer: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act_map = {"elu": nn.elu, "tanh": jnp.tanh, None: None}
        for i in range(self.n_layers):
            y = x
            n = self.n_filters
            activation = nn.elu
            join_mode = "add"
            kinit = nn.initializers.glorot_uniform()
            normalize = False
            last = i == self.n_layers - 1
            second_last = i == self.n_layers - 2
            if last:
                activation = act_map[self.output_activation]
                if self.output_n_filters is not None:
                    n = self.output_n_filters
                    join_mode = "truncate_add"
                    normalize = self.normalization is not None
            if self.output_layer:
                if last or second_last:
                    kinit = _rn_init
                if last:
                    normalize = False
            x = nn.Conv(n, self.filter_size, padding="SAME",
                        dtype=self.dtype, kernel_init=kinit,
                        bias_init=nn.initializers.zeros)(x)
            if self.peepholes:
                x = peephole_join(x, y, mode=join_mode)
            if normalize:
                x = nn.LayerNorm()(x)
            if activation is not None:
                x = activation(x)
            if self.dropout > 0:
                # SpatialDropout2D: drop whole feature maps
                x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                               deterministic=deterministic)(x)
            if self.pools:
                h, w = x.shape[1:3]
                ph = min(self.pool_size[0], h)
                pw = min(self.pool_size[1], w)
                x = nn.avg_pool(x, (ph, pw), strides=(ph, pw), padding="VALID")
        return x


class KeyboardConv(nn.Module):
    """build_blocks.py:68-83: a full-height, 3-wide conv whose output
    channels are (rotation x piece) action maps aligned to board columns."""
    n_rot: int = 4
    n_pieces: int = 7

    @nn.compact
    def __call__(self, x):
        h = x.shape[1]
        x = nn.Conv(self.n_rot * self.n_pieces, (h, 3), padding="VALID",
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.normal(1e-5))(x)
        # (B, 1, W, R*P): channel group p of size n_pieces == rotation p
        parts = [x[:, :, :, p * self.n_pieces:(p + 1) * self.n_pieces]
                 for p in range(self.n_rot)]
        return jnp.concatenate(parts, axis=1)  # (B, R, W, P)


# ---------------------------------------------------------------------------
# The architecture
# ---------------------------------------------------------------------------


# The reference's architecture registry (network.py:25-32):
#   silver   -> resblock_kbd   (the only arch that actually builds upstream)
#   dreamer  -> resblock       (identity advantage head: cannot produce the
#                               (R,T,P) action plane, sventon_architectures
#                               .py:52-55 — repaired here with a dense head)
#   vanilla  -> convthendense  (upstream hits a NameError in
#                               legacy_build_blocks.create_vectorencoder:22
#                               ('self' in a free function) — repaired here)
#   keyboard -> convkeyboard   (same NameErrors :44/:78 + missing settings
#                               keys — repaired here)
ARCHITECTURES = ("silver", "vanilla", "keyboard", "dreamer")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """resblock_kbd settings (experiments/sventon_ppo.py:46-58 defaults).

    compute_dtype: activation/conv compute precision.  'bfloat16' (the
    default) runs the towers on the MXU at full rate with float32 params
    and float32 heads (policy softmax / value tanh stay f32).  Measured
    (docs/NOTES_ROUND3.md "bf16 A/B"): 1M-step learning curves match f32
    within 0.03-0.07 nats of entropy at every checkpoint, end-to-end
    training is ~14% faster at the committed 1024x64 mb64 recipe (the
    gain is geometry-dependent — f32 is ~10% faster at mb512), and the
    committed 10M flagship runs trained with it.  Set 'float32' for
    bit-stable comparisons."""
    compute_dtype: str = "bfloat16"
    architecture: str = "silver"     # one of ARCHITECTURES (network.py:25-32)
    n_rotations: int = 4
    n_pieces: int = 7
    tower_layers: int = 5
    tower_filters: int = 64
    tower_filter_size: int = 3
    val_layers: int = 6
    val_filters: int = 128
    val_filter_size: int = 5
    dropout: float = 0.0
    separate_piece_values: bool = True
    visual_stack: Tuple[str, ...] = ()
    used_pieces: Tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6)

    def __post_init__(self):
        if self.architecture not in ARCHITECTURES:
            raise ValueError(
                f"unknown architecture {self.architecture!r}; "
                f"expected one of {ARCHITECTURES} (network.py:25-32)")

    @property
    def piece_mask(self):
        m = [1.0 if p in self.used_pieces else 0.0 for p in range(7)]
        return jnp.asarray(m, jnp.float32)


class SventonNet(nn.Module):
    """resblock_kbd (sventon_architectures.py:23-73): the shared trunk
    producing raw (V, A) streams; heads differ per flavour below.

    kbd_head=False is the 'dreamer' (plain resblock) entry: the reference's
    identity advantage head cannot produce the (R, T, P) action plane
    (sventon_architectures.py:52-55 returns the raw conv stack), so the
    repaired variant uses a dense action head over the flattened advantage
    stream — the same head shape its own 'vanilla' arch uses."""
    cfg: ModelConfig
    full_network: bool = True   # workers skip the value stream (base_architecture.py:63-71)
    kbd_head: bool = True

    @nn.compact
    def __call__(self, vec, vis, deterministic: bool = True):
        c = self.cfg
        cdtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        tower = dict(n_layers=c.tower_layers, n_filters=c.tower_filters,
                     filter_size=(c.tower_filter_size,) * 2, dropout=c.dropout,
                     dtype=cdtype)
        # 1) pad visuals (+ optional feature stack)
        vis = [apply_visual_pad(v) for v in vis]
        if c.visual_stack:
            vis = [visual_stack(v, c.visual_stack) for v in vis]
        # 2) per-perspective visual encoder (separate weights, like separate
        #    tf variable creations per call)
        if cdtype is not None:
            vis = [v.astype(cdtype) for v in vis]
            vec = [v.astype(cdtype) for v in vec]
        hidden_vis = [ResidualBlock(**tower)(v, deterministic) for v in vis]
        # 3) tile vector data into feature planes, join
        h, w = hidden_vis[0].shape[1:3]
        vecp = [conv_shape_vector(v, h, w) for v in vec]
        visvec = [peephole_join(vp, hv, mode="concat")
                  for vp, hv in zip(vecp, hidden_vis)]
        # 4) second tower per perspective
        joined = [ResidualBlock(**tower)(v, deterministic) for v in visvec]
        # 5) advantage stream: my joined stream + opponent scalar planes
        adv_in = peephole_join(joined[0], vecp[1], mode="add")
        a = ResidualBlock(output_activation=None, **tower)(adv_in, deterministic)
        a = a.astype(jnp.float32)
        if self.kbd_head:
            raw_A = KeyboardConv(c.n_rotations, c.n_pieces)(a)  # (B, R, W, P)
        else:
            W_board = a.shape[2] - 2        # undo the wall padding
            flat = a.reshape(a.shape[0], -1)
            raw_A = nn.Dense(
                c.n_rotations * W_board * c.n_pieces,
                kernel_init=nn.initializers.glorot_uniform(),
            )(flat).reshape(-1, c.n_rotations, W_board, c.n_pieces)
        # 7) value stream (trainer-side only)
        if self.full_network:
            vstream = jnp.concatenate(joined + vis, axis=-1)
            v = ResidualBlock(
                dtype=cdtype,
                n_layers=c.val_layers, n_filters=c.val_filters,
                filter_size=(c.val_filter_size,) * 2, pools=True,
                output_n_filters=(c.n_pieces + 1 if c.separate_piece_values else 1),
                output_activation=None, output_layer=True,
                normalization="layer", dropout=c.dropout,
            )(vstream, deterministic)
            # pool to (B, 1, 1, P+1)
            v = jnp.mean(v.astype(jnp.float32), axis=(1, 2), keepdims=True)
            # normalize_advantages(inplace=True, axis=3, tanh): ch0 is the
            # baseline, ch1.. are per-piece offsets, mean-centered
            # (sventon_architectures.py:50, network_utils.py:8-35)
            if v.shape[-1] > 1:
                base, offs = v[..., :1], v[..., 1:]
                mean = jnp.mean(offs, axis=3, keepdims=True)
                mask = c.piece_mask.reshape(1, 1, 1, -1)
                mean = jnp.sum(mean * mask, axis=3, keepdims=True) / jnp.sum(mask)
                v = jnp.tanh(base + (offs - mean))
            else:
                v = jnp.tanh(v)
            raw_V = v  # (B, 1, 1, P) or (B, 1, 1, 1)
        else:
            raw_V = jnp.zeros((vec[0].shape[0], 1, 1, 1), jnp.float32)
        return raw_V, raw_A


class ConvThenDense(nn.Module):
    """Legacy 'convthendense' architecture (sventon_architectures.py:95-118):
    per-perspective conv encoders + vector MLPs, flattened and concatenated,
    dense value head and a dense (R*T*P) advantage head."""
    cfg: ModelConfig
    full_network: bool = True
    n_translations: int = 10
    vec_hidden: int = 256
    vec_out: int = 32
    conv_filters: Tuple[int, ...] = (16, 32, 32, 4)
    value_hidden: int = 256
    advantage_range: float = 1.0

    @nn.compact
    def __call__(self, vec, vis, deterministic: bool = True):
        c = self.cfg
        hidden_vec = []
        for v in vec:
            h = nn.relu(nn.Dense(self.vec_hidden)(v))
            hidden_vec.append(nn.Dense(self.vec_out)(h))
        hidden_vis = []
        for v in vis:
            x = apply_visual_pad(v)
            for i, f in enumerate(self.conv_filters):
                k = (7, 7) if i == 0 else (3, 3)
                x = nn.elu(nn.Conv(f, k, padding="SAME")(x))
                if i == 0:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
            hidden_vis.append(x.reshape(x.shape[0], -1))
        x = jnp.concatenate(hidden_vec + hidden_vis, axis=-1)
        if self.full_network:
            h = nn.elu(nn.Dense(self.value_hidden)(x))
            n = c.n_pieces + 1 if c.separate_piece_values else 1
            V = jnp.tanh(nn.Dense(n)(h))
        else:
            V = jnp.zeros((x.shape[0], 1), jnp.float32)
        raw_V = V.reshape(V.shape[0], 1, 1, -1)
        if raw_V.shape[-1] > 1:
            base, offs = raw_V[..., :1], raw_V[..., 1:]
            raw_V = base + (offs - jnp.mean(offs, axis=3, keepdims=True))
        A = nn.Dense(c.n_rotations * self.n_translations * c.n_pieces,
                     kernel_init=nn.initializers.glorot_uniform())(x)
        raw_A = self.advantage_range * A.reshape(
            -1, c.n_rotations, self.n_translations, c.n_pieces)
        return raw_V, raw_A


def advantage_activation_sqrt(x):
    """network_utils.advantage_activation_sqrt: sign-preserving sqrt."""
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x) + 1e-12)


class ConvKeyboard(nn.Module):
    """The 'keyboard' (convkeyboard) legacy architecture
    (sventon_architectures.py:75-93 + legacy_build_blocks.py), repaired:
    the upstream free functions dereference an undefined `self`
    (legacy_build_blocks.py:22,44,78) and require settings keys absent from
    the keyboardconv preset (keyboard_n_convs), so it cannot build there.
    This version keeps the documented structure with the keyboardconv
    preset's constants (presets.py:106-121): dense vector encoders
    (256 -> 32, tanh out), a 4-conv visual encoder (16,32,32,4; 7x7 then
    3x3; peepholes on layers 0-2, (2,1) max-pool after layer 2), a
    keyboard-conv action head on MY visual encoding, and a dense value head
    (256 hidden, tanh value + centered sqrt-activated piece offsets)."""
    cfg: ModelConfig
    full_network: bool = True
    vec_hidden: int = 256
    vec_out: int = 32
    conv_filters: Tuple[int, ...] = (16, 32, 32, 4)
    peephole_layers: Tuple[int, ...] = (0, 1, 2)
    pool_after: Tuple[int, ...] = (2,)
    value_hidden: int = 256

    @nn.compact
    def __call__(self, vec, vis, deterministic: bool = True):
        c = self.cfg
        hidden_vec = []
        for v in vec:
            h = nn.elu(nn.Dense(self.vec_hidden)(v))
            hidden_vec.append(jnp.tanh(nn.Dense(self.vec_out)(h)))
        encoded = []
        for v in vis:
            x = apply_visual_pad(v)
            for i, f in enumerate(self.conv_filters):
                k = (7, 7) if i == 0 else (3, 3)
                y = nn.elu(nn.Conv(f, k, padding="SAME")(x))
                x = (peephole_join(x, y, mode="concat")
                     if i in self.peephole_layers else y)
                if i in self.pool_after:
                    x = nn.max_pool(x, (2, 1), strides=(2, 1), padding="SAME")
            encoded.append(x)
        # action head: "my screen -> my kbd" (sventon_architectures.py:84)
        raw_A = KeyboardConv(c.n_rotations, c.n_pieces)(encoded[0])
        flat = hidden_vec + [e.reshape(e.shape[0], -1) for e in encoded]
        x = jnp.concatenate(flat, axis=-1)
        if self.full_network:
            h = nn.elu(nn.Dense(self.value_hidden)(x))
            v = jnp.tanh(nn.Dense(1)(h))
            if c.separate_piece_values:
                vp = nn.Dense(7)(h)
                vp = 0.5 * advantage_activation_sqrt(
                    vp - jnp.mean(vp, axis=1, keepdims=True))
                v = v + vp                               # (B, 7)
        else:
            v = jnp.zeros((x.shape[0], 1), jnp.float32)
        raw_V = v.reshape(v.shape[0], 1, 1, -1)
        return raw_V, raw_A


def make_trunk(cfg: ModelConfig, full_network: bool) -> nn.Module:
    """The architecture registry (network.py:25-32), resolved from
    cfg.architecture.  Unknown names raise at ModelConfig construction."""
    if cfg.architecture == "silver":
        return SventonNet(cfg, full_network)
    if cfg.architecture == "dreamer":
        return SventonNet(cfg, full_network, kbd_head=False)
    if cfg.architecture == "vanilla":
        return ConvThenDense(cfg, full_network)
    if cfg.architecture == "keyboard":
        return ConvKeyboard(cfg, full_network)
    raise ValueError(cfg.architecture)


class PPONet(nn.Module):
    """ppo_nets' network function (ppo_nets.py:24-33): policy == softmaxed
    keyboard head, value == per-piece tanh values."""
    cfg: ModelConfig
    full_network: bool = True

    @nn.compact
    def __call__(self, vec, vis, deterministic: bool = True):
        raw_V, raw_A = make_trunk(self.cfg, self.full_network)(
            vec, vis, deterministic)
        pi = action_softmax(raw_A)                       # (B, R, W, P)
        v = raw_V.reshape(raw_V.shape[0], -1)            # (B, P) or (B, 1)
        return pi, v


class QNet(nn.Module):
    """prio_qnet's network function: dueling Q via qva_from_raw_streams
    (network_utils.py:100-104)."""
    cfg: ModelConfig
    full_network: bool = True
    advantage_mode: str = "mean"

    @nn.compact
    def __call__(self, vec, vis, deterministic: bool = True):
        c = self.cfg
        raw_V, raw_A = make_trunk(self.cfg, self.full_network)(
            vec, vis, deterministic)
        a = normalize_advantages(
            raw_A, piece_mask=c.piece_mask, mode=self.advantage_mode,
            separate_piece_values=c.separate_piece_values, activation=jnp.tanh)
        q = raw_V + a                                    # (B, R, W, P)
        v = q_to_v(q, piece_mask=c.piece_mask)           # (B, 1)
        return q, v, a
