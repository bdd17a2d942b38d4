"""mlp_mnist — generic MLP training on MNIST-style data.

Reference: the ELEKTRONN v1 style MLP configs kept alive through
``elektronn2/data/traindata.py``. Demonstrates the Perceptron path and the
non-image ``Data`` classes (synthetic fallback when mnist.pkl.gz is absent).

Run:  elektronn2-train examples/mlp_mnist.py --cpu --n-steps 200
"""

save_name = "mlp_mnist"
batch_size = 64
n_steps = 2000
history_freq = 200
save_freq = 0
optimiser = "Adam"
optimiser_params = {"lr": 1e-3}
n_workers = 1


def _make_data():
    from elektronn2_tpu.data.traindata import MNISTData
    return MNISTData()


data_instance = _make_data()


def create_model():
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset()
    inp = nm.Input([batch_size, 784], "b,f", name="raw")
    h1 = nm.Perceptron(inp, 256, activation_func="relu",
                       dropout_rate=0.1, name="h1")
    h2 = nm.Perceptron(h1, 128, activation_func="relu", name="h2")
    out = nm.Perceptron(h2, 10, activation_func="lin", name="out")
    probs = nm.Softmax(out, name="probs")
    tgt = nm.Input([batch_size], "b", dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True, name="nll")
    loss = nm.AggregateLoss(nll, name="loss")
    err = nm.Errors(probs, tgt, target_is_sparse=True)
    model = nm.model_manager.getmodel("mlp_mnist")
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs, error_node=err)
    return model


if __name__ == "__main__":
    from elektronn2_tpu.scripts.train import main
    import sys
    main([__file__] + sys.argv[1:])
