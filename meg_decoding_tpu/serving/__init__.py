from meg_decoding_tpu.serving.export import (  # noqa: F401
    ServingModel,
    export_serving,
    load_artifact,
    make_serving_forward,
    save_artifact,
)
