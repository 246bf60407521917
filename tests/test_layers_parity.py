"""Numerical parity tests: each JAX layer vs the TF reference layer with the
reference's randomly initialised weights copied over."""
import numpy as np
import pytest

from .reference_oracle import require_reference

jnp = pytest.importorskip("jax.numpy")
import jax

from mbexwn_vocoder_tpu import nn as mnn
from mbexwn_vocoder_tpu import ops as mops


def tf_conv_params(ref_layer):
    """Extract {v, g, b} from a built TF2C_Conv1DWeightNorm."""
    p = {}
    if ref_layer.use_weight_norm:
        p["v"] = jnp.asarray(ref_layer.v.numpy())
        p["g"] = jnp.asarray(ref_layer.g.numpy())
    else:
        p["kernel"] = jnp.asarray(ref_layer.conv1d_layer.kernel.numpy())
    if ref_layer.conv1d_layer.use_bias:
        p["b"] = jnp.asarray(ref_layer.conv1d_layer.bias.numpy())
    return p


@pytest.mark.parametrize("padding,dilation,ks", [("SAME", 1, 3), ("SAME", 4, 3), ("VALID", 1, 5), ("CAUSAL", 2, 3)])
def test_conv1d_weightnorm_parity(padding, dilation, ks):
    require_reference()
    from MBExWN_NVoc.vocoder.model.tf2_components.layers.conv_layers import TF2C_Conv1DWeightNorm

    rng = np.random.RandomState(0)
    x = rng.randn(2, 50, 12).astype(np.float32)

    ref = TF2C_Conv1DWeightNorm(8, kernel_size=ks, padding=padding.lower() if padding != "CAUSAL" else "causal",
                                dilation_rate=dilation, use_weight_norm=True)
    y_ref = ref(x).numpy()

    ours = mnn.Conv1DWeightNorm(8, kernel_size=ks, padding=padding, dilation_rate=dilation)
    params = tf_conv_params(ref)
    y = np.asarray(ours(params, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)

    # folded weight-norm must agree with the per-call recompute
    folded = mops.fold_weight_norm(params)
    y2 = np.asarray(ours(folded, jnp.asarray(x)))
    np.testing.assert_allclose(y2, y_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("up,factor", [(True, 2), (True, 5), (False, 2)])
def test_conv1d_updown_parity(up, factor):
    require_reference()
    from MBExWN_NVoc.vocoder.model.tf2_components.layers.conv_layers import TF2C_Conv1DUpDownSample

    rng = np.random.RandomState(1)
    x = rng.randn(2, 40, 8).astype(np.float32)

    ref = TF2C_Conv1DUpDownSample(8, kernel_size=3, up_sample=up, factor=factor,
                                  use_checkerboard_free_init=up, padding="same",
                                  use_weight_norm=True)
    y_ref = ref(x).numpy()

    ours = mnn.Conv1DUpDownSample(8, kernel_size=3, up_sample=up, factor=factor,
                                  use_checkerboard_free_init=up, padding="SAME")
    params = tf_conv_params(ref)
    y = np.asarray(ours(params, jnp.asarray(x)))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("U,num_pad_end,drop_last,C", [(4, 0, False, 3), (4, 1, True, 3), (15, 1, True, 1), (2, 2, False, 5)])
def test_lininterp_parity(U, num_pad_end, drop_last, C):
    require_reference()
    from MBExWN_NVoc.vocoder.model.tf2_components.layers.support_layers import TF2C_LinInterpLayer

    rng = np.random.RandomState(2)
    x = rng.randn(2, 13, C).astype(np.float32)
    ref = TF2C_LinInterpLayer(upsampling_factor=U, num_pad_end=num_pad_end, drop_last=drop_last)
    y_ref = ref(x).numpy()
    y = np.asarray(mops.linear_interp_upsample(jnp.asarray(x), U, num_pad_end, drop_last))
    assert y.shape == y_ref.shape, (y.shape, y_ref.shape)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["CONSTANT", "REFLECT", "SYMMETRIC", "EDGE"])
def test_pad1d_parity(mode):
    require_reference()
    from MBExWN_NVoc.vocoder.model.custom_layers import TFPad1d

    rng = np.random.RandomState(3)
    x = rng.randn(2, 20, 4).astype(np.float32)
    ref = TFPad1d(padding_size=(3, 2), padding_type=mode)
    y_ref = ref(x).numpy()
    y = np.asarray(mops.pad1d(jnp.asarray(x), 3, 2, mode))
    np.testing.assert_allclose(y, y_ref, rtol=0, atol=0)


def test_activations_parity():
    require_reference()
    from MBExWN_NVoc.vocoder.model.custom_AE_layers import ActivationLayer

    rng = np.random.RandomState(4)
    x = rng.randn(2, 30, 6).astype(np.float32) * 3
    for act in ["tanh", "sigmoid", "soft_sign", "elu", "selu", "soft_sigmoid", "soft_sqrt", "exp", "relu", "leaky_relu"]:
        ref = ActivationLayer(activation_function=act)
        y_ref = ref(x).numpy()
        ours = mnn.Activation(act)
        p, _ = ours.init(jax.random.PRNGKey(0), x.shape)
        y = np.asarray(ours(p, jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-6, err_msg=act)


def test_prelu_parity():
    require_reference()
    import tensorflow as tf

    rng = np.random.RandomState(5)
    x = rng.randn(2, 30, 6).astype(np.float32)
    ref = tf.keras.layers.PReLU(alpha_initializer=tf.keras.initializers.Constant(0.3), shared_axes=[1])
    y_ref = ref(x).numpy()
    ours = mnn.PReLU(alpha=0.3)
    p, _ = ours.init(jax.random.PRNGKey(0), x.shape)
    np.testing.assert_allclose(np.asarray(ours(p, jnp.asarray(x))), y_ref, rtol=1e-6, atol=1e-7)


def _copy_wavenet_params(ref_wn, ours):
    params = {"start": tf_conv_params(ref_wn.start), "end": tf_conv_params(ref_wn.end)}
    if ref_wn.cond_layer is not None:
        params["cond"] = tf_conv_params(ref_wn.cond_layer)
    for i, (rl, ol) in enumerate(zip(ref_wn.conv_layers, ours.conv_layers)):
        params[ol.name] = tf_conv_params(rl)
    for rl, ol in zip(ref_wn.res_skip_layers, ours.res_skip_layers):
        params[ol.name] = tf_conv_params(rl)
    for rl, ol in zip(ref_wn.pre_cond_layers, ours.pre_cond_layers):
        params[ol.name] = tf_conv_params(rl)
    return params


@pytest.mark.parametrize("cond_conv_up,cond_lin_up,n_grp", [(None, 1, 1), (2, 5, 1), (None, 1, 2)])
def test_wavenet_parity(cond_conv_up, cond_lin_up, n_grp):
    require_reference()
    from MBExWN_NVoc.vocoder.model.custom_AE_layers import WaveNetAE as RefWaveNetAE

    rng = np.random.RandomState(6)
    T_mel = 8
    ups = 1 if cond_conv_up is None else cond_conv_up * cond_lin_up
    audio = rng.randn(2, T_mel * ups, 11).astype(np.float32)
    mel = rng.randn(2, T_mel, 20).astype(np.float32)

    kwargs = dict(n_channels=16, n_layers=3, kernel_size=3, n_out_channels=6,
                  n_ch_groups=n_grp, dilation_rate_step=1, max_log2_dilation_rate=2,
                  use_weight_norm=True, activation="gtu",
                  cond_kernel_size=3, cond_conv_upsampling=cond_conv_up,
                  cond_lin_upsampling=cond_lin_up)
    ref = RefWaveNetAE(use_tf25_compatible_implementation=True, **kwargs)
    y_ref = ref((audio, mel)).numpy()

    ours = mnn.WaveNetAE(padding="SAME", **kwargs)
    params = _copy_wavenet_params(ref, ours)
    y = np.asarray(ours(params, (jnp.asarray(audio), jnp.asarray(mel))))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=5e-5, atol=5e-5)


def test_wavenet_block_parity():
    require_reference()
    from MBExWN_NVoc.vocoder.model.custom_AE_layers import WaveNetAEBlock as RefBlock

    rng = np.random.RandomState(7)
    T_mel = 6
    audio = rng.randn(2, T_mel * 10, 11).astype(np.float32)
    mel = rng.randn(2, T_mel, 20).astype(np.float32)

    kwargs = dict(n_out_channels=6, n_channels=16, n_layers=2, kernel_size=3,
                  up_sample=True, up_down_factor=5,
                  cond_kernel_size=3, cond_conv_upsampling=2, cond_lin_upsampling=5)
    ref = RefBlock(use_tf25_compatible_implementation=True, **kwargs)
    y_ref = ref((audio, mel)).numpy()

    ours = mnn.WaveNetAEBlock(**kwargs)
    params = {"wavenet": _copy_wavenet_params(ref.wavenet, ours.wavenet),
              "up_down": tf_conv_params(ref.up_down_sample)}
    y = np.asarray(ours(params, (jnp.asarray(audio), jnp.asarray(mel))))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=5e-5, atol=5e-5)


def test_stft_istft_parity_with_tf_signal():
    require_reference()
    import tensorflow as tf

    rng = np.random.RandomState(8)
    x = rng.randn(2, 4801).astype(np.float32)
    L, S, F = 1200, 300, 2048

    ref = tf.signal.stft(x, frame_length=L, frame_step=S, fft_length=F, pad_end=False).numpy()
    win = np.asarray(tf.signal.hann_window(L))
    ours = np.asarray(mops.stft(jnp.asarray(x), L, S, F, jnp.asarray(win)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)

    # inverse with inverse_stft_window_fn OLA normalisation
    spec = ref
    y_ref = tf.signal.inverse_stft(
        spec, frame_length=L, frame_step=S, fft_length=F,
        window_fn=tf.signal.inverse_stft_window_fn(frame_step=S, forward_window_fn=tf.signal.hann_window),
    ).numpy()
    inv_win = mops.inverse_stft_window(L, S, win)
    tf_inv_win = tf.signal.inverse_stft_window_fn(frame_step=S, forward_window_fn=tf.signal.hann_window)(L, tf.float32).numpy()
    np.testing.assert_allclose(inv_win, tf_inv_win, rtol=1e-5, atol=1e-6)
    y = np.asarray(mops.istft(jnp.asarray(spec), L, S, F, jnp.asarray(inv_win)))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_pqmf_ops_parity():
    require_reference()
    from MBExWN_NVoc.vocoder.model.tf_preprocess import TFPQMF

    from mbexwn_vocoder_tpu.dsp.pqmf import pqmf_filters

    rng = np.random.RandomState(9)
    x = rng.randn(2, 1600, 1).astype(np.float32)
    ref = TFPQMF(subbands=4, taps=62, cutoff_ratio=0.142, beta=9.0, do_synthesis=False)
    bands_ref = ref.analysis(x).numpy()

    ana, syn = pqmf_filters(4, 62, 0.142, 9.0)
    bands = np.asarray(mops.pqmf_analysis(jnp.asarray(x), jnp.asarray(ana), 4, 62))
    assert bands.shape == bands_ref.shape
    np.testing.assert_allclose(bands, bands_ref, rtol=1e-4, atol=1e-5)

    y_ref = ref.synthesis(bands_ref).numpy()
    y = np.asarray(mops.pqmf_synthesis(jnp.asarray(bands), jnp.asarray(syn), 4, 62))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


def test_oscillator_parity():
    require_reference()
    from MBExWN_NVoc.vocoder.model.tf_wavetable import PulseWaveTable

    ref = PulseWaveTable(sample_rate=12000, nominalF0=50.0, maxF0=650.0, F0GridFactor=1.25,
                         wt_oversampling=2, Oq=0.5, am=0.8, rta=0.05, quiet=True, trainable=False)
    rng = np.random.RandomState(10)
    freq = (100 + 300 * np.abs(np.sin(np.linspace(0, 7, 3503)))).astype(np.float32)[None].repeat(2, 0)
    freq = freq + rng.randn(*freq.shape).astype(np.float32)

    y_ref = ref(freq)
    y_ref = (y_ref.numpy() if hasattr(y_ref, "numpy") else np.asarray(y_ref))[:, :, 0]

    wt = np.asarray(ref.wavetables)
    from mbexwn_vocoder_tpu.ops.oscillator import grid_crossfade

    # 1. phase parity: circular distance (phases live on the unit circle);
    #    fp32 cumsum association differs between XLA (parallel scan) and TF
    #    (sequential) so allow a few ulp-scale slack
    phase = np.asarray(mops.stable_cumsum_and_wrap(jnp.asarray(freq) / 12000.0))
    phase_ref = ref.stable_cumsum_and_wrap(freq / np.float32(12000.0)).numpy()
    d = np.abs(phase - phase_ref)
    circ = np.minimum(d, 1.0 - d)
    assert np.max(circ) < 1e-4, np.max(circ)

    # 2. lookup + crossfade parity at identical phases (isolates the gather/
    #    lerp/tent-weight math from cumsum noise)
    grid = mops.wavetable_lookup(jnp.asarray(phase_ref), jnp.asarray(wt))
    y = np.asarray(grid_crossfade(grid, jnp.asarray(freq), ref.nominalF0, 1.25,
                                  float(ref.minTranspositionFactorInGrid.numpy()),
                                  float(ref.maxTranspositionFactorInGrid.numpy())))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)

    # 3. full own-phase pipeline: relative RMSE bound (cumsum noise amplified
    #    by the wavetable slope stays ~1e-4 relative)
    grid2 = mops.wavetable_lookup(jnp.asarray(phase), jnp.asarray(wt))
    y2 = np.asarray(grid_crossfade(grid2, jnp.asarray(freq), ref.nominalF0, 1.25,
                                   float(ref.minTranspositionFactorInGrid.numpy()),
                                   float(ref.maxTranspositionFactorInGrid.numpy())))
    rel = np.sqrt(np.mean((y2 - y_ref) ** 2) / np.mean(y_ref**2))
    assert rel < 1e-3, rel


def test_subnet_builder_matches_reference_structure():
    require_reference()
    from MBExWN_NVoc.vocoder.model.custom_pulsed_generator import generate_subnet_from_specs as ref_gen
    import tensorflow as tf

    specs = [[3, 24, 2], [3, 16, "L5"], [3, 8, "L5"], [3, 8, "L3"]]
    ref_layers, ref_ups = ref_gen(
        specs, base_name="PulsPar", activation=tf.keras.layers.PReLU,
        final_n_channels=1, final_nks=1, final_activation="soft_sigmoid",
        target_ups=150, use_tf25_compatible_implementation=True,
        alpha_initializer=tf.keras.initializers.Constant(0.2), shared_axes=[1],
    )
    ours, ups = mnn.generate_subnet_from_specs(
        specs, base_name="PulsPar", final_n_channels=1, final_nks=1,
        final_activation="soft_sigmoid", target_ups=150, use_prelu=True, alpha=0.2,
    )
    assert ups == ref_ups == 150
    assert len(ours.layers) == len(ref_layers)

    # run the reference subnet and ours with copied weights
    rng = np.random.RandomState(11)
    x = rng.randn(1, 9, 20).astype(np.float32)
    y_ref = x
    for ll in ref_layers:
        y_ref = ll(y_ref)
    y_ref = y_ref.numpy()

    import jax

    params, _ = ours.init(jax.random.PRNGKey(0), x.shape)
    for rl, ol in zip(ref_layers, ours.layers):
        if rl.__class__.__name__.endswith("WeightNorm") or rl.__class__.__name__.endswith("UpDownSample"):
            params[ol.name] = tf_conv_params(rl)
        elif rl.__class__.__name__ == "PReLU":
            params[ol.name] = {"alpha": jnp.asarray(rl.alpha.numpy().reshape(-1))}
    y = np.asarray(ours(params, jnp.asarray(x)))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=5e-5, atol=5e-5)
