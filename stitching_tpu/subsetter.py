"""Match-graph subsetting: keep the largest connected component.

Parity: reference `stitching/subsetter.py:1-79` — confidence-threshold
union over the pair graph (cv.detail.leaveBiggestComponent analog), the
"Not all images are included" warning, the <2-survivors StitchingError, the
DOT matches-graph dump (cv.detail.matchesGraphAsString analog, including the
issue-#56 zero-threshold quirk), and the static re-indexing helpers.

Union-find runs on host: N is tiny (image count), this is pure control flow.
"""

import warnings
from itertools import chain

import numpy as np

from .errors import StitchingError, StitchingWarning
from .feature_matcher import FeatureMatcher


class Subsetter:
    DEFAULT_CONFIDENCE_THRESHOLD = 1
    DEFAULT_MATCHES_GRAPH_DOT_FILE = None

    def __init__(
        self,
        confidence_threshold=DEFAULT_CONFIDENCE_THRESHOLD,
        matches_graph_dot_file=DEFAULT_MATCHES_GRAPH_DOT_FILE,
    ):
        self.confidence_threshold = confidence_threshold
        self.save_file = matches_graph_dot_file

    def subset(self, img_names, features, matches):
        self.save_matches_graph_dot_file(img_names, matches)
        indices = self.get_indices_to_keep(features, matches)

        if len(indices) < len(img_names):
            warnings.warn(
                "Not all images are included in the final panorama. If this is not intended, use the 'matches_graph_dot_file' parameter to analyze your matches. You might want to lower the 'confidence_threshold' or try another 'detector' to include all your images.",  # noqa: E501
                StitchingWarning,
            )
        return indices

    def save_matches_graph_dot_file(self, img_names, pairwise_matches):
        if self.save_file:
            with open(self.save_file, "w") as filehandler:
                filehandler.write(
                    self.get_matches_graph(img_names, pairwise_matches))

    def get_matches_graph(self, img_names, pairwise_matches):
        conf_threshold = (
            0.00001  # reference issue #56: a 0 threshold breaks the dump
            if self.confidence_threshold == 0
            else self.confidence_threshold
        )
        n = len(img_names)
        matrix = FeatureMatcher.get_matches_matrix(pairwise_matches)
        lines = ["graph matches_graph{"]
        connected = set()
        for i in range(n):
            for j in range(i + 1, n):
                m = matrix[i][j]
                if m.confidence < conf_threshold:
                    continue
                connected.update((i, j))
                lines.append(
                    f'"{img_names[i]}" -- "{img_names[j]}"'
                    f'[label="Nm={m.num_matches}, Ni={m.num_inliers}, '
                    f'C={m.confidence:g}"];'
                )
        for i in range(n):
            if i not in connected:
                lines.append(f'"{img_names[i]}";')
        lines.append("}")
        return "\n".join(lines) + "\n"

    def get_indices_to_keep(self, features, pairwise_matches):
        n = len(features)
        parent = list(range(n))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        matrix = FeatureMatcher.get_matches_matrix(pairwise_matches)
        for i in range(n):
            for j in range(i + 1, n):
                if matrix[i][j].confidence >= self.confidence_threshold:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[rb] = ra

        comps = {}
        for i in range(n):
            comps.setdefault(find(i), []).append(i)
        indices = sorted(max(comps.values(), key=len))

        if len(indices) < 2:
            raise StitchingError(
                "No match exceeds the given confidence threshold. Do your images have enough overlap and common features? If yes, you might want to lower the 'confidence_threshold' or try another 'detector'."  # noqa: E501
            )
        return np.array(indices)

    @staticmethod
    def subset_list(list_to_subset, indices):
        return [list_to_subset[i] for i in indices]

    @staticmethod
    def subset_matches(pairwise_matches, indices):
        matches_matrix = FeatureMatcher.get_matches_matrix(pairwise_matches)
        matches_matrix = np.array(matches_matrix, dtype=object)
        matches_matrix_subset = matches_matrix[np.ix_(indices, indices)]
        return list(chain.from_iterable(matches_matrix_subset.tolist()))
