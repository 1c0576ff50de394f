"""ContrastiveEval — embedding-quality evaluation for degradation
predictors.

Mirror of rumpy/regression/evaluation/eval_hub.py:36-900 core features:
embedding dump (npz + csv), t-SNE (and UMAP when available) scatter plots
colored by degradation class, and clustering scores (Davies-Bouldin,
Calinski-Harabasz, silhouette).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


class ContrastiveEval:
    def __init__(self, handler, state, m_map=None, valid=None, mags=None,
                 num_classes=0, labelling_strategy="default"):
        self.handler = handler
        self.state = state
        self.m_map = m_map or {}
        self.valid = valid or []
        self.mags = mags or []
        self.num_classes = num_classes
        self.labelling_strategy = labelling_strategy

    def generate_data_encoding(self, loader) -> Tuple[np.ndarray, np.ndarray]:
        from rumpy_tpu.models import contrastive_labelling as cl
        embeddings: List[np.ndarray] = []
        labels: List[np.ndarray] = []
        for batch in loader:
            imgs = batch["lr"]
            if isinstance(imgs, list):
                imgs = np.stack(imgs)
            if imgs.ndim == 5:  # multi-crop: use the first crop
                imgs = imgs[:, 0]
            emb = np.asarray(self.handler.run_embedding(self.state, imgs))
            embeddings.append(emb)
            metas = batch.get("metadata")
            if (metas is not None and np.size(metas) and self.m_map
                    and self.num_classes):
                metas = np.asarray(metas, np.float32)
                labels.append(np.asarray(cl.assign_classes(
                    metas, self.m_map, self.valid, self.mags,
                    self.num_classes, self.labelling_strategy)))
            else:
                labels.append(np.zeros(emb.shape[0], np.int32))
        return np.concatenate(embeddings), np.concatenate(labels)

    @staticmethod
    def clustering_scores(embeddings: np.ndarray,
                          labels: np.ndarray) -> Dict[str, float]:
        from sklearn import metrics as skm
        uniq = np.unique(labels)
        if len(uniq) < 2 or len(embeddings) <= len(uniq):
            return {}
        return {
            "davies_bouldin": float(skm.davies_bouldin_score(embeddings,
                                                             labels)),
            "calinski_harabasz": float(
                skm.calinski_harabasz_score(embeddings, labels)),
            "silhouette": float(skm.silhouette_score(embeddings, labels)),
        }

    @staticmethod
    def dump_embeddings(embeddings: np.ndarray, labels: np.ndarray,
                        path_prefix: str) -> None:
        np.savez(path_prefix + ".npz", embeddings=embeddings, labels=labels)
        import pandas as pd
        df = pd.DataFrame(embeddings)
        df["label"] = labels
        df.to_csv(path_prefix + ".csv", index=False)

    @staticmethod
    def scatter_plot(embeddings: np.ndarray, labels: np.ndarray,
                     out_path: str, method: str = "tsne") -> Optional[str]:
        if len(embeddings) < 5:
            return None
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        if method not in ("tsne", "umap"):
            raise ValueError(f"Unknown scatter method {method!r} "
                             "(expected 'tsne' or 'umap')")
        if method == "umap":
            try:
                import umap
                reducer = umap.UMAP(n_components=2)
                pts = reducer.fit_transform(embeddings)
            except ImportError:
                method = "tsne"
        if method == "tsne":
            from sklearn.manifold import TSNE
            perp = min(30, max(2, len(embeddings) // 3))
            pts = TSNE(n_components=2,
                       perplexity=perp).fit_transform(embeddings)
        fig, ax = plt.subplots(figsize=(6, 5))
        sc = ax.scatter(pts[:, 0], pts[:, 1], c=labels, cmap="tab20", s=12)
        fig.colorbar(sc, ax=ax, label="degradation class")
        ax.set_title(f"{method} embedding map")
        fig.tight_layout()
        fig.savefig(out_path)
        plt.close(fig)
        return out_path
