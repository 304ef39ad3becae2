"""TF-Saver checkpoint importer: mapping + numeric forward parity.

Builds the reference's exact TF-1 graph shape (Input_Layer projection ->
BasicLSTMCell stack under time-major dynamic_rnn -> Output_layer,
/root/reference/models/AcousticModel.py:189-317) with TF's compat API,
saves it through a TF Saver, imports it with
tools/import_tf_checkpoint.py, and checks this framework's forward
produces the same logits from the same input — which pins the kernel
row-split, the (i, g, f, o) gate order and the +1 forget-bias convention
against real TensorFlow numerics, not just our own documentation.
"""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
))

D, H, L, V, T, B = 6, 8, 2, 10, 12, 3


@pytest.fixture(scope="module")
def tf_checkpoint(tmp_path_factory):
    """(ckpt_prefix, inputs, seq_lengths, tf_logits) from a reference-shaped
    TF graph with random weights."""
    root = tmp_path_factory.mktemp("tfckpt")
    v1 = tf.compat.v1
    v1.reset_default_graph()
    v1.disable_eager_execution()

    rng = np.random.default_rng(0)
    inputs_np = rng.normal(0, 1, (T, B, D)).astype(np.float32)
    lengths_np = np.array([T, 5, 9], np.int32)

    graph = v1.Graph()
    with graph.as_default():
        inputs = v1.placeholder(tf.float32, (T, B, D))
        seq_len = v1.placeholder(tf.int32, (B,))
        v1.get_variable("global_step", initializer=np.int64(67_600),
                        trainable=False)
        v1.get_variable("learning_rate",
                        initializer=np.float32(2.5e-4), trainable=False)
        with v1.variable_scope("Input_Layer"):
            w_i = v1.get_variable(
                "input_w", (D, H), tf.float32,
                initializer=v1.random_normal_initializer(stddev=0.4, seed=1),
            )
            b_i = v1.get_variable(
                "input_b", (H,), tf.float32,
                initializer=v1.random_normal_initializer(stddev=0.1, seed=2),
            )
        rnn_inputs = tf.tensordot(inputs, w_i, axes=[[2], [0]]) + b_i
        # BasicLSTMCell math written with raw TF ops under the cell's exact
        # variable names (TF 2.21 / Keras 3 removed the compat rnn_cell
        # classes): gates = [x; h] @ kernel + bias, split (i, j, f, o),
        # c' = c*sigmoid(f + 1) + sigmoid(i)*tanh(j), h' = tanh(c')*sigmoid(o)
        # — the TF-1.4 BasicLSTMCell definition the reference ran, with
        # dynamic_rnn's sequence_length semantics (zero output + frozen
        # state past each row's true length).
        kernels, biases = [], []
        for layer in range(L):
            with v1.variable_scope(
                f"rnn/multi_rnn_cell/cell_{layer}/basic_lstm_cell"
            ):
                kernels.append(v1.get_variable(
                    "kernel", (2 * H, 4 * H), tf.float32,
                    initializer=v1.random_normal_initializer(
                        stddev=0.3, seed=10 + layer
                    ),
                ))
                biases.append(v1.get_variable(
                    "bias", (4 * H,), tf.float32,
                    initializer=v1.zeros_initializer(),
                ))
        layer_in = rnn_inputs
        for layer in range(L):
            c = tf.zeros((B, H))
            h = tf.zeros((B, H))
            outs = []
            for t in range(T):
                gates = (
                    tf.matmul(tf.concat([layer_in[t], h], axis=1),
                              kernels[layer]) + biases[layer]
                )
                i_g, j_g, f_g, o_g = tf.split(gates, 4, axis=1)
                c_new = (c * tf.sigmoid(f_g + 1.0)
                         + tf.sigmoid(i_g) * tf.tanh(j_g))
                h_new = tf.tanh(c_new) * tf.sigmoid(o_g)
                valid = tf.cast(t < seq_len, tf.float32)[:, None]
                c = valid * c_new + (1.0 - valid) * c
                h = valid * h_new + (1.0 - valid) * h
                outs.append(valid * h_new)
            layer_in = tf.stack(outs)
        rnn_out = layer_in
        with v1.variable_scope("Output_layer"):
            w_o = v1.get_variable(
                "output_w", (H, V), tf.float32,
                initializer=v1.random_normal_initializer(stddev=0.4, seed=3),
            )
            b_o = v1.get_variable(
                "output_b", (V,), tf.float32,
                initializer=v1.random_normal_initializer(stddev=0.1, seed=4),
            )
        logits = tf.tensordot(rnn_out, w_o, axes=[[2], [0]]) + b_o
        saver = v1.train.Saver()
        with v1.Session(graph=graph) as sess:
            sess.run(v1.global_variables_initializer())
            # Randomize the LSTM kernels too (default initializers are
            # orthogonal/zeros; we want arbitrary values for parity).
            for var in v1.global_variables():
                if "kernel" in var.name or "bias" in var.name:
                    sess.run(var.assign(
                        rng.normal(0, 0.3, var.shape.as_list()).astype(
                            np.float32
                        )
                    ))
            tf_logits = sess.run(
                logits, {inputs: inputs_np, seq_len: lengths_np}
            )
            prefix = saver.save(sess, str(root / "acousticmodel.ckpt"))
    return prefix, inputs_np, lengths_np, tf_logits


def test_import_and_forward_parity(tf_checkpoint, tmp_path):
    prefix, inputs_np, lengths_np, tf_logits = tf_checkpoint
    import import_tf_checkpoint as imp

    out_dir = str(tmp_path / "npz")
    path = imp.import_checkpoint(prefix, out_dir)
    assert os.path.exists(path)

    import jax
    import jax.numpy as jnp

    from rnn_speech_tpu.models import acoustic
    from rnn_speech_tpu.train import checkpoint as ckpt

    cfg = acoustic.AcousticConfig(
        num_layers=L, hidden_size=H, input_dim=D, num_labels=V
    )
    template = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    restored = ckpt.restore(out_dir, template)
    assert restored is not None
    params, step, lr = restored
    assert step == 67_600
    np.testing.assert_allclose(lr, 2.5e-4, rtol=1e-6)

    logits, _ = acoustic.forward(
        params, cfg, jnp.asarray(inputs_np), jnp.asarray(lengths_np),
        acoustic.zero_state(cfg, B),
    )
    np.testing.assert_allclose(
        np.asarray(logits), tf_logits, atol=2e-5, rtol=1e-4
    )


def test_import_rejects_mismatched_kernel(tf_checkpoint, tmp_path):
    prefix, *_ = tf_checkpoint
    import import_tf_checkpoint as imp

    tf_vars = imp.read_tf_variables(prefix)
    # Corrupt one kernel's shape: the mapper must refuse, not mis-split.
    bad = {
        k: (v[:-1] if k.endswith("cell_0/basic_lstm_cell/kernel") else v)
        for k, v in tf_vars.items()
    }
    if not any(k.endswith("cell_0/basic_lstm_cell/kernel") for k in bad):
        pytest.skip("TF version names cells differently")
    with pytest.raises(ValueError, match="kernel shape"):
        imp.map_reference_variables(bad)
