from . import erfnet, erfnet_imagenet

# Registry mirroring the reference's ``--model erfnet`` dynamic import
# (train/main.py uses importlib.import_module(args.model)).
REGISTRY = {
    "erfnet": erfnet,
    "erfnet_imagenet": erfnet_imagenet,
}


def get_model(name):
    try:
        return REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(REGISTRY)}")
