"""End-to-end fine-tune driver: loss decreases, checkpoint serves."""

import numpy as np

from voitta_rag_tpu.models.finetune import finetune


def test_finetune_end_to_end(tmp_path, temp_root):
    pairs = [(f"topic {i} question about subject {i}",
              f"subject {i} detailed passage text body {i} " * 3)
             for i in range(64)]
    cfg, params, losses = finetune(
        pairs, model_name="test-tiny", output_dir=tmp_path / "ft",
        epochs=3, batch_size=16, max_seq_len=32, lr=1e-3, dp=4, tp=2)
    assert len(losses) >= 6
    assert np.mean(losses[-2:]) < np.mean(losses[:2]), losses

    # The checkpoint loads into the serving path.
    from voitta_rag_tpu.services.embedding import EmbeddingService

    svc = EmbeddingService(model_name="test-tiny",
                           model_path=str(tmp_path / "ft"), max_seq_len=32)
    emb = svc.embed_query_array("topic 3 question")
    assert emb.shape == (cfg.hidden_size,)
    assert np.isfinite(emb).all()
